"""decode_scale: the density-calibration decode knob (gnfx/sample.py).

At sharp decoder_c the probability threshold cannot move the decode
radius (sigmoid(C(1-d^2)) is a near-hard cutoff at d=1), so decode_scale
divides embedding distances before decoding. Monotone: larger scale ->
denser; scale=1.0 is the identity (bit-equal to the unscaled decode).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.config import AEConfig
from gnfx.models.flow import FlowConfig, init_flow
from gnfx.sample import sample_batch_device, sample_graphs


def _setup():
    fcfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=1)
    acfg = AEConfig(embed_dim=4, feature_dim=4, decoder_c=100.0)
    flow_p = init_flow(jax.random.PRNGKey(0), fcfg)
    return fcfg, acfg, flow_p


def _edges(adj, n):
    a = np.asarray(adj)
    return float(sum(a[i, :n[i], :n[i]].sum() / 2 for i in range(len(n))))


def test_decode_scale_monotone_density():
    fcfg, acfg, flow_p = _setup()
    n = jnp.asarray([8, 8, 8, 8], jnp.int32)
    key = jax.random.PRNGKey(1)
    counts = []
    for s in (0.5, 1.0, 2.0, 4.0):
        adj, _ = sample_batch_device(flow_p, None, fcfg, acfg, key, n, 8,
                                     decode_scale=s)
        counts.append(_edges(adj, np.asarray(n)))
    assert counts == sorted(counts), counts
    assert counts[-1] > counts[0]          # the knob actually moves density


def test_decode_scale_one_is_identity():
    fcfg, acfg, flow_p = _setup()
    n = jnp.asarray([6, 6], jnp.int32)
    key = jax.random.PRNGKey(2)
    a_default, _ = sample_batch_device(flow_p, None, fcfg, acfg, key, n, 8)
    a_one, _ = sample_batch_device(flow_p, None, fcfg, acfg, key, n, 8,
                                   decode_scale=1.0)
    np.testing.assert_array_equal(np.asarray(a_default), np.asarray(a_one))


def test_sample_graphs_accepts_decode_scale():
    fcfg, acfg, flow_p = _setup()
    size_dist = np.zeros(9)
    size_dist[8] = 1.0
    gs = sample_graphs(flow_p, None, fcfg, acfg, 4, size_dist, 8,
                       batch_size=4, decode_scale=1.5,
                       connect_components=True)
    assert len(gs) == 4
    assert all(g.number_of_nodes() == 8 for g in gs)
