"""Flow-core correctness (SURVEY.md §4.1–4.2): exact invertibility, log-det vs
autodiff Jacobian ground truth, permutation invariance of log_prob, padding
invariance — the load-bearing properties for correct NLL."""

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.graph import batch_from_dense
from gnfx.models.flow import (
    FlowConfig,
    base_log_prob,
    coupling_forward,
    flow_forward,
    flow_inverse,
    init_flow,
    log_prob,
    sample_latents,
)


def _batch(key, bsz=2, max_n=6, dim=4):
    k1, k2, k3 = jax.random.split(key, 3)
    n_node = jax.random.randint(k1, (bsz,), 3, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.5).astype(jnp.float32)
    a = jnp.triu(a, 1)
    a = a + jnp.transpose(a, (0, 2, 1))
    gb = batch_from_dense(a, n_node)
    x = jax.random.normal(k3, (bsz, max_n, dim)) * gb.node_mask[..., None]
    return gb, x


def _nontrivial_params(key, cfg):
    """Random flow params with the zero-init s/t heads perturbed so the flow
    is far from the identity (zero-init would make log-det tests vacuous)."""
    params = init_flow(key, cfg)

    def perturb(path, leaf):
        if any(getattr(p, "key", None) == "out" for p in path):
            k = jax.random.fold_in(key, hash(str(path)) % (2**31))
            return leaf + 0.01 * jax.random.normal(k, leaf.shape)
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, params)


def test_identity_at_init():
    cfg = FlowConfig(node_dim=4, num_couplings=3, gnn_hidden=8, gnn_rounds=1)
    params = init_flow(jax.random.PRNGKey(0), cfg)
    gb, x = _batch(jax.random.PRNGKey(1))
    z, ld = flow_forward(params, cfg, x, gb)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)
    lp = log_prob(params, cfg, x, gb)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(base_log_prob(x, gb)), rtol=1e-6
    )


def test_invertibility():
    cfg = FlowConfig(node_dim=4, num_couplings=4, gnn_hidden=16, gnn_rounds=2)
    params = _nontrivial_params(jax.random.PRNGKey(2), cfg)
    gb, x = _batch(jax.random.PRNGKey(3))
    z, ld_f = flow_forward(params, cfg, x, gb)
    x_back, ld_b = flow_inverse(params, cfg, z, gb)
    assert not np.allclose(np.asarray(z), np.asarray(x))  # non-trivial flow
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld_f), rtol=1e-5)


def test_logdet_matches_autodiff_jacobian():
    """Exactness of the change-of-variables term: compare the analytic
    log-det against slogdet of the autodiff Jacobian on a tiny graph."""
    cfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=2)
    params = _nontrivial_params(jax.random.PRNGKey(4), cfg)
    max_n, n = 5, 4  # one padded slot: Jacobian restricted to real dims
    a = jnp.zeros((1, max_n, max_n))
    edges = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)]
    for u, v in edges:
        a = a.at[0, u, v].set(1.0).at[0, v, u].set(1.0)
    gb = batch_from_dense(a, jnp.array([n]))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, max_n, cfg.node_dim))
    x = x * gb.node_mask[..., None]

    def f_flat(x_real_flat):
        x_full = jnp.zeros((1, max_n, cfg.node_dim))
        x_full = x_full.at[0, :n].set(x_real_flat.reshape(n, cfg.node_dim))
        z, _ = flow_forward(params, cfg, x_full, gb)
        return z[0, :n].reshape(-1)

    x_flat = x[0, :n].reshape(-1)
    jac = jax.jacfwd(f_flat)(x_flat)
    sign, logdet_auto = jnp.linalg.slogdet(jac)
    _, logdet_analytic = flow_forward(params, cfg, x, gb)
    assert float(sign) == 1.0
    np.testing.assert_allclose(
        float(logdet_analytic[0]), float(logdet_auto), rtol=1e-4
    )


def test_log_prob_permutation_invariant():
    cfg = FlowConfig(node_dim=4, num_couplings=3, gnn_hidden=16, gnn_rounds=2)
    params = _nontrivial_params(jax.random.PRNGKey(6), cfg)
    gb, x = _batch(jax.random.PRNGKey(7), bsz=2, max_n=7)
    lp = log_prob(params, cfg, x, gb)
    rng = np.random.default_rng(1)
    for b in range(2):
        n = int(gb.n_node[b])
        perm = np.arange(7)
        perm[:n] = rng.permutation(n)
        xp = x.at[b].set(x[b][perm])
        adjp = gb.adj.at[b].set(gb.adj[b][perm][:, perm])
        lpp = log_prob(params, cfg, xp, gb.replace(adj=adjp))
        np.testing.assert_allclose(float(lpp[b]), float(lp[b]), rtol=1e-5)


def test_log_prob_padding_invariant():
    """Adding pad slots must not change log_prob — the NLL-correctness test."""
    cfg = FlowConfig(node_dim=4, num_couplings=3, gnn_hidden=16, gnn_rounds=2)
    params = _nontrivial_params(jax.random.PRNGKey(8), cfg)
    gb, x = _batch(jax.random.PRNGKey(9), bsz=2, max_n=6)
    lp = log_prob(params, cfg, x, gb)
    pad = 4
    adj_w = jnp.pad(gb.adj, ((0, 0), (0, pad), (0, pad)))
    x_w = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    gb_w = batch_from_dense(adj_w, gb.n_node, x_w)
    lp_w = log_prob(params, cfg, x_w, gb_w)
    np.testing.assert_allclose(np.asarray(lp_w), np.asarray(lp), rtol=1e-5)


def test_sample_latents_masked():
    gb, _ = _batch(jax.random.PRNGKey(10))
    z = sample_latents(jax.random.PRNGKey(11), gb)
    m = np.asarray(gb.node_mask)
    assert np.all(np.asarray(z)[m == 0] == 0)
    assert np.std(np.asarray(z)[m == 1]) > 0.5


def test_coupling_single_layer_logdet_formula():
    """One coupling's log-det equals the masked sum of its s outputs —
    cross-checked against autodiff on a 2-node graph."""
    cfg = FlowConfig(node_dim=2, num_couplings=1, gnn_hidden=8, gnn_rounds=1)
    params = _nontrivial_params(jax.random.PRNGKey(12), cfg)
    layer = jax.tree.map(lambda l: l[0], params)
    a = jnp.array([[[0.0, 1.0], [1.0, 0.0]]])
    gb = batch_from_dense(a, jnp.array([2]))
    x = jax.random.normal(jax.random.PRNGKey(13), (1, 2, 2))

    def f_flat(xf):
        z, _ = coupling_forward(layer, cfg, xf.reshape(1, 2, 2), gb)
        return z.reshape(-1)

    jac = jax.jacfwd(f_flat)(x.reshape(-1))
    _, ld_auto = jnp.linalg.slogdet(jac)
    _, ld = coupling_forward(layer, cfg, x, gb)
    np.testing.assert_allclose(float(ld[0]), float(ld_auto), rtol=1e-4)


# ---------------------------------------------------------------------------
# rational-quadratic spline couplings (coupling="rqs")
# ---------------------------------------------------------------------------

def _rqs_cfg(**kw):
    return FlowConfig(node_dim=4, num_couplings=3, gnn_hidden=16, gnn_rounds=2,
                      coupling="rqs", rqs_bins=5, **kw)


def _spline_params(key, cfg, scale=0.05):
    """Random flow params with moderately perturbed spline heads: visibly
    non-identity without saturating outputs at the spline boundary (where
    the inverse is float-ill-conditioned)."""
    params = init_flow(key, cfg)

    def perturb(path, leaf):
        if any(getattr(p, "key", None) == "out" for p in path):
            k = jax.random.fold_in(key, hash(str(path)) % (2**31))
            return leaf + scale * jax.random.normal(k, leaf.shape)
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, params)


def test_rqs_identity_at_init():
    cfg = _rqs_cfg()
    params = init_flow(jax.random.PRNGKey(0), cfg)
    gb, x = _batch(jax.random.PRNGKey(1))
    z, ld = flow_forward(params, cfg, x, gb)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)


def test_rqs_invertibility():
    """Spline inversion itself is Newton-refined to float noise; the residual
    round-trip error of a stack comes from θ-sensitivity (each recovered
    half conditions the next inverse), which compounds with depth under
    random parameters. Pin a tight single-coupling bound and a loose
    full-stack bound; the forward log-det exactness (the property NLL
    depends on) is pinned separately against autodiff."""
    from gnfx.models.flow import coupling_forward, coupling_inverse

    cfg = _rqs_cfg()
    params = _spline_params(jax.random.PRNGKey(2), cfg)
    gb, x = _batch(jax.random.PRNGKey(3))

    layer = jax.tree.map(lambda l: l[0], params)
    z1, ld_f1 = coupling_forward(layer, cfg, x, gb)
    x_b1, ld_b1 = coupling_inverse(layer, cfg, z1, gb)
    assert not np.allclose(np.asarray(z1), np.asarray(x))
    np.testing.assert_allclose(np.asarray(x_b1), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ld_b1), np.asarray(ld_f1),
                               rtol=1e-3, atol=1e-3)

    # full stack at trained-like parameter scale (random θ at 10× larger
    # scale measurably amplifies the per-hop error ~50× per layer — an
    # adversarial regime SGD-trained smooth flows do not enter)
    params_s = _spline_params(jax.random.PRNGKey(21), cfg, scale=0.01)
    z, _ = flow_forward(params_s, cfg, x, gb)
    x_back, _ = flow_inverse(params_s, cfg, z, gb)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)


def test_rqs_logdet_matches_autodiff_jacobian():
    cfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=1,
                     coupling="rqs", rqs_bins=4)
    params = _spline_params(jax.random.PRNGKey(4), cfg)
    max_n, n = 5, 4
    a = jnp.zeros((1, max_n, max_n))
    for u, v in [(0, 1), (1, 2), (2, 3), (0, 3)]:
        a = a.at[0, u, v].set(1.0).at[0, v, u].set(1.0)
    gb = batch_from_dense(a, jnp.array([n]))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, max_n, cfg.node_dim))
    x = x * gb.node_mask[..., None]

    def f_flat(x_real_flat):
        x_full = jnp.zeros((1, max_n, cfg.node_dim))
        x_full = x_full.at[0, :n].set(x_real_flat.reshape(n, cfg.node_dim))
        z, _ = flow_forward(params, cfg, x_full, gb)
        return z[0, :n].reshape(-1)

    jac = jax.jacfwd(f_flat)(x[0, :n].reshape(-1))
    sign, logdet_auto = jnp.linalg.slogdet(jac)
    _, logdet_analytic = flow_forward(params, cfg, x, gb)
    assert float(sign) == 1.0
    np.testing.assert_allclose(float(logdet_analytic[0]), float(logdet_auto),
                               rtol=1e-4)


def test_rqs_padding_invariant():
    cfg = _rqs_cfg()
    params = _spline_params(jax.random.PRNGKey(8), cfg)
    gb, x = _batch(jax.random.PRNGKey(9), bsz=2, max_n=6)
    lp = log_prob(params, cfg, x, gb)
    adj_w = jnp.pad(gb.adj, ((0, 0), (0, 4), (0, 4)))
    x_w = jnp.pad(x, ((0, 0), (0, 4), (0, 0)))
    gb_w = batch_from_dense(adj_w, gb.n_node, x_w)
    lp_w = log_prob(params, cfg, x_w, gb_w)
    np.testing.assert_allclose(np.asarray(lp_w), np.asarray(lp), rtol=1e-5)


def test_rqs_tails_identity():
    """Outside [-B, B] the transform is the identity with zero log-det."""
    cfg = FlowConfig(node_dim=2, num_couplings=1, gnn_hidden=8, gnn_rounds=1,
                     coupling="rqs", rqs_bins=4, rqs_range=2.0)
    params = _spline_params(jax.random.PRNGKey(12), cfg)
    a = jnp.array([[[0.0, 1.0], [1.0, 0.0]]])
    gb = batch_from_dense(a, jnp.array([2]))
    x = jnp.full((1, 2, 2), 7.5)  # far outside the spline support
    z, ld = flow_forward(params, cfg, x, gb)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)
