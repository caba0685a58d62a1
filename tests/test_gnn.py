"""Message-passing tests: dense/segment parity, equivariance, mask invariance
(SURVEY.md §4.1–4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnfx.graph import batch_from_dense
from gnfx.ops.gnn import (
    GNNConfig,
    aggregate_dense,
    aggregate_segment,
    apply_gnn,
    init_gnn,
)


def _random_batch(key, bsz=3, max_n=10, dim=6):
    k1, k2, k3 = jax.random.split(key, 3)
    n_node = jax.random.randint(k1, (bsz,), 3, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.4).astype(jnp.float32)
    a = jnp.triu(a, 1)
    a = a + jnp.transpose(a, (0, 2, 1))  # undirected, no self loops
    gb = batch_from_dense(a, n_node)
    x = jax.random.normal(k3, (bsz, max_n, dim)) * gb.node_mask[..., None]
    return gb, x


def test_dense_vs_segment_aggregation():
    """The dense masked matmul must equal the sparse segment-sum oracle."""
    key = jax.random.PRNGKey(0)
    gb, _ = _random_batch(key, bsz=4, max_n=12)
    msgs = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 5))
    msgs = msgs * gb.node_mask[..., None]
    dense = aggregate_dense(gb.adj, msgs)
    adj_np = np.asarray(gb.adj)
    for b in range(4):
        senders, receivers = np.nonzero(adj_np[b])
        seg = aggregate_segment(
            jnp.asarray(senders), jnp.asarray(receivers), msgs[b], num_nodes=12
        )
        np.testing.assert_allclose(np.asarray(dense[b]), np.asarray(seg), atol=1e-5)


@pytest.mark.parametrize("mode", ["sender", "pairwise"])
@pytest.mark.parametrize("agg", ["mean", "sum"])
def test_permutation_equivariance(mode, agg):
    """GNN(P·x, P·A·Pᵀ) == P·GNN(x, A) — the paper's key structural claim."""
    cfg = GNNConfig(
        in_dim=6, hidden_dim=16, out_dim=4, num_rounds=2,
        message_mode=mode, aggregation=agg,
    )
    params = init_gnn(jax.random.PRNGKey(2), cfg)
    gb, x = _random_batch(jax.random.PRNGKey(3), bsz=2, max_n=8)
    # full permutation of all 8 slots is NOT mask-preserving; permute within
    # the real prefix of each graph instead.
    y = apply_gnn(params, cfg, x, gb)
    rng = np.random.default_rng(0)
    for b in range(2):
        n = int(gb.n_node[b])
        perm = np.arange(8)
        perm[:n] = rng.permutation(n)
        xp = x.at[b].set(x[b][perm])
        adjp = gb.adj.at[b].set(gb.adj[b][perm][:, perm])
        gbp = gb.replace(adj=adjp)
        yp = apply_gnn(params, cfg, xp, gbp)
        np.testing.assert_allclose(
            np.asarray(yp[b]), np.asarray(y[b][perm]), atol=1e-4
        )


@pytest.mark.parametrize("mode", ["sender", "pairwise"])
def test_padding_invariance(mode):
    """Widening the pad region must not change outputs on real slots."""
    cfg = GNNConfig(in_dim=6, hidden_dim=16, out_dim=4, num_rounds=2, message_mode=mode)
    params = init_gnn(jax.random.PRNGKey(4), cfg)
    gb, x = _random_batch(jax.random.PRNGKey(5), bsz=2, max_n=8)
    y = apply_gnn(params, cfg, x, gb)

    pad = 5
    adj_w = jnp.pad(gb.adj, ((0, 0), (0, pad), (0, pad)))
    x_w = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    gb_w = batch_from_dense(adj_w, gb.n_node, x_w)
    y_w = apply_gnn(params, cfg, x_w, gb_w)
    np.testing.assert_allclose(np.asarray(y_w[:, :8]), np.asarray(y), atol=1e-5)
    # padded slots are exactly zero
    assert np.all(np.asarray(y_w[:, 8:]) == 0)


def test_zero_init_out_is_zero_map():
    cfg = GNNConfig(in_dim=4, hidden_dim=8, out_dim=4, zero_init_out=True)
    params = init_gnn(jax.random.PRNGKey(6), cfg)
    gb, x = _random_batch(jax.random.PRNGKey(7), bsz=2, max_n=6, dim=4)
    y = apply_gnn(params, cfg, x, gb)
    assert np.all(np.asarray(y) == 0)


def test_global_context_equivariant_and_padding_safe():
    """The per-graph global channel must keep equivariance and padding
    invariance (masked mean)."""
    cfg = GNNConfig(in_dim=6, hidden_dim=16, out_dim=4, num_rounds=2,
                    use_global=True)
    params = init_gnn(jax.random.PRNGKey(20), cfg)
    gb, x = _random_batch(jax.random.PRNGKey(21), bsz=2, max_n=8)
    y = apply_gnn(params, cfg, x, gb)
    # permutation within real prefix
    rng = np.random.default_rng(2)
    b, n = 0, int(gb.n_node[0])
    perm = np.arange(8)
    perm[:n] = rng.permutation(n)
    xp = x.at[b].set(x[b][perm])
    adjp = gb.adj.at[b].set(gb.adj[b][perm][:, perm])
    yp = apply_gnn(params, cfg, xp, gb.replace(adj=adjp))
    np.testing.assert_allclose(np.asarray(yp[b]), np.asarray(y[b][perm]),
                               atol=1e-4)
    # padding invariance
    pad = 4
    adj_w = jnp.pad(gb.adj, ((0, 0), (0, pad), (0, pad)))
    x_w = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    from gnfx.graph import batch_from_dense
    gb_w = batch_from_dense(adj_w, gb.n_node, x_w)
    y_w = apply_gnn(params, cfg, x_w, gb_w)
    np.testing.assert_allclose(np.asarray(y_w[:, :8]), np.asarray(y), atol=1e-5)
