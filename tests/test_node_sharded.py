"""Ring node-sharded aggregation == dense single-device (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnfx.parallel.mesh import make_mesh
from gnfx.parallel.node_sharded import ring_aggregate


def test_ring_aggregate_matches_dense(eight_devices):
    n, h = 64, 16
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    adj = (jax.random.uniform(k1, (n, n)) < 0.3).astype(jnp.float32)
    adj = jnp.triu(adj, 1)
    adj = adj + adj.T
    msgs = jax.random.normal(k2, (n, h))

    dense = jnp.einsum("uv,uh->vh", adj, msgs)
    mesh = make_mesh()
    ring = ring_aggregate(adj, msgs, mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_ring_aggregate_rejects_indivisible(eight_devices):
    mesh = make_mesh()
    with pytest.raises(ValueError):
        ring_aggregate(jnp.zeros((10, 10)), jnp.zeros((10, 4)), mesh)
