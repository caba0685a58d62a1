"""Reversible backbone + supervised task tests (SURVEY.md §4, §7 phase 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnfx.data.citation import load_citation
from gnfx.graph import batch_from_dense
from gnfx.models.flow import FlowConfig, flow_forward, init_flow
from gnfx.models.reversible import flow_forward_rev
from gnfx.models.supervised import (
    SupervisedConfig,
    accuracy,
    citation_to_batch,
    forward,
    init_supervised,
    masked_ce,
    train_supervised,
)


def _batch(key, bsz=2, max_n=6, dim=4):
    k1, k2 = jax.random.split(key)
    n_node = jax.random.randint(k1, (bsz,), 3, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.5).astype(jnp.float32)
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


def test_reversible_forward_matches_plain():
    cfg = FlowConfig(node_dim=4, num_couplings=4, gnn_hidden=16, gnn_rounds=2)
    params = _nontrivial_params(jax.random.PRNGKey(0), cfg)
    gb = _batch(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 4)) * gb.node_mask[..., None]
    z_plain, _ = flow_forward(params, cfg, x, gb)
    z_rev = flow_forward_rev(params, cfg, x, gb)
    np.testing.assert_allclose(np.asarray(z_rev), np.asarray(z_plain), atol=1e-6)


def test_reversible_grads_match_autodiff():
    """The O(1)-memory custom VJP must reproduce plain autodiff gradients
    (inverse-reconstruction drift within float32 tolerance)."""
    cfg = FlowConfig(node_dim=4, num_couplings=3, gnn_hidden=16, gnn_rounds=1)
    params = _nontrivial_params(jax.random.PRNGKey(3), cfg)
    gb = _batch(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 4)) * gb.node_mask[..., None]
    w = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 4))

    def loss_plain(p, x):
        z, _ = flow_forward(p, cfg, x, gb)
        return jnp.sum(z * w)

    def loss_rev(p, x):
        return jnp.sum(flow_forward_rev(p, cfg, x, gb) * w)

    gp_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    gp_r, gx_r = jax.grad(loss_rev, argnums=(0, 1))(params, x)
    # tolerances sized for f32 inverse-reconstruction drift, which varies
    # with XLA op scheduling run-to-run (observed marginal at 1e-3/1e-5)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gp_p), jax.tree.leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=1e-4)


def test_citation_synthetic_shapes():
    g = load_citation("cora-small")
    assert g.num_nodes == 600 and g.num_classes == 7
    assert g.adj.shape == (600, 600)
    np.testing.assert_allclose(g.adj, g.adj.T)
    assert g.train_mask.sum() == 7 * 20
    assert not (g.train_mask & g.val_mask).any()
    assert not (g.train_mask & g.test_mask).any()
    # homophily: same-label edge fraction well above chance (1/7)
    src, dst = np.nonzero(g.adj)
    same = (g.labels[src] == g.labels[dst]).mean()
    assert same > 0.5, same


def test_citation_batch_padding():
    g = load_citation("cora-small")
    gb, labels, masks = citation_to_batch(g, pad_to=128)
    assert gb.max_nodes == 640  # 600 -> next multiple of 128
    assert int(gb.n_node[0]) == 600
    assert float(masks["train"][600:].sum()) == 0.0


def test_masked_ce_and_accuracy():
    logits = jnp.asarray(np.array([[[10.0, 0.0], [0.0, 10.0], [10.0, 0.0]]]))
    labels = jnp.array([0, 1, 1])
    mask = jnp.array([1.0, 1.0, 0.0])  # third node masked out
    assert float(accuracy(logits, labels, mask)) == 1.0
    assert float(masked_ce(logits, labels, mask)) < 0.01
    mask_all = jnp.array([1.0, 1.0, 1.0])
    assert float(accuracy(logits, labels, mask_all)) == pytest.approx(2 / 3)


@pytest.mark.slow
def test_supervised_learns():
    """GRevNet classifier beats chance clearly on the homophilous synthetic
    citation graph (integration, CPU)."""
    g = load_citation("cora-small")
    gb, labels, masks = citation_to_batch(g)
    cfg = SupervisedConfig(
        num_features=g.features.shape[1], num_classes=g.num_classes,
        node_dim=16, num_couplings=3, gnn_hidden=32, num_steps=120,
    )
    _, res = train_supervised(cfg, gb, labels, masks)
    assert res["train_acc"] > 0.9, res
    assert res["test_acc"] > 2.5 / 7, res  # >> 1/7 chance
