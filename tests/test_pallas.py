"""Fused Pallas MP+coupling kernel vs the XLA reference path, in interpreter
mode on CPU (SURVEY.md §5 race-detection strategy: interpret=True is the CI
sanitizer for kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnfx.graph import batch_from_dense
from gnfx.models.flow import FlowConfig, flow_forward, init_flow, log_prob
from gnfx.ops.pallas_mp import flow_forward_fused, fused_coupling_forward, log_prob_fused
from gnfx.models.flow import coupling_forward


def _batch(key, bsz=2, max_n=8, dim=4):
    k1, k2 = jax.random.split(key)
    n_node = jax.random.randint(k1, (bsz,), 3, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.4).astype(jnp.float32)
    a = jnp.triu(a, 1)
    a = a + jnp.transpose(a, (0, 2, 1))
    return batch_from_dense(a, n_node)


def _nontrivial_params(key, cfg):
    params = init_flow(key, cfg)

    def perturb(path, leaf):
        if any(getattr(p, "key", None) == "out" for p in path):
            k = jax.random.fold_in(key, hash(str(path)) % (2**31))
            return leaf + 0.02 * jax.random.normal(k, leaf.shape)
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, params)


@pytest.mark.parametrize("agg", ["mean", "sum"])
def test_fused_coupling_matches_xla(agg):
    cfg = FlowConfig(node_dim=4, num_couplings=1, gnn_hidden=16, gnn_rounds=2,
                     aggregation=agg)
    params = _nontrivial_params(jax.random.PRNGKey(0), cfg)
    layer = jax.tree.map(lambda l: l[0], params)
    gb = _batch(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 4)) * gb.node_mask[..., None]
    z_ref, ld_ref = coupling_forward(layer, cfg, x, gb)
    z_k, ld_k = fused_coupling_forward(layer, cfg, x, gb, interpret=True)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_flow_matches_xla():
    cfg = FlowConfig(node_dim=6, num_couplings=3, gnn_hidden=16, gnn_rounds=1)
    params = _nontrivial_params(jax.random.PRNGKey(3), cfg)
    gb = _batch(jax.random.PRNGKey(4), bsz=3, max_n=8, dim=6)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 8, 6)) * gb.node_mask[..., None]
    z_ref, ld_ref = flow_forward(params, cfg, x, gb)
    z_k, ld_k = flow_forward_fused(params, cfg, x, gb, interpret=True)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref),
                               rtol=1e-4, atol=1e-4)
    lp_ref = log_prob(params, cfg, x, gb)
    lp_k = log_prob_fused(params, cfg, x, gb, interpret=True)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_ref),
                               rtol=1e-4)


def test_fused_rejects_pairwise():
    cfg = FlowConfig(node_dim=4, num_couplings=1, message_mode="pairwise")
    params = init_flow(jax.random.PRNGKey(6), cfg)
    layer = jax.tree.map(lambda l: l[0], params)
    gb = _batch(jax.random.PRNGKey(7))
    x = jnp.zeros((2, 8, 4))
    with pytest.raises(NotImplementedError):
        fused_coupling_forward(layer, cfg, x, gb, interpret=True)
