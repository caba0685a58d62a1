"""ActNorm input layer: data-init standardisation, exact invertibility,
log-det correctness vs autodiff (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.graph import batch_from_dense
from gnfx.models.flow import (
    FlowConfig,
    flow_forward,
    flow_inverse,
    init_flow,
    log_prob,
)


def _batch(key, bsz=2, max_n=6, dim=4):
    k1, k2 = jax.random.split(key)
    n_node = jax.random.randint(k1, (bsz,), 3, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.5).astype(jnp.float32)
    a = jnp.triu(a, 1)
    a = a + jnp.transpose(a, (0, 2, 1))
    gb = batch_from_dense(a, n_node)
    x = 3.0 + 2.0 * jax.random.normal(jax.random.PRNGKey(9), (bsz, max_n, dim))
    return gb, x * gb.node_mask[..., None]


def test_actnorm_standardises_and_inverts():
    cfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=1,
                     use_actnorm=True)
    gb, x = _batch(jax.random.PRNGKey(0))
    mean = np.full(4, 3.0)
    std = np.full(4, 2.0)
    params = init_flow(jax.random.PRNGKey(1), cfg, mean, std)
    assert "actnorm" in params and "couplings" in params
    z, ld = flow_forward(params, cfg, x, gb)
    # couplings are identity at init -> z is standardised x
    m = np.asarray(gb.node_mask) == 1
    zr = np.asarray(z)[m]
    assert abs(zr.mean()) < 0.3 and abs(zr.std() - 1.0) < 0.3
    x_back, ld_b = flow_inverse(params, cfg, z, gb)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld), rtol=1e-5)
    # logdet = -n * sum(log std) at identity couplings
    expect = -np.asarray(gb.n_node) * np.log(2.0 + 1e-6) * 4
    np.testing.assert_allclose(np.asarray(ld), expect, rtol=1e-4)


def test_actnorm_logdet_matches_autodiff():
    cfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=1,
                     use_actnorm=True)
    params = init_flow(jax.random.PRNGKey(2), cfg,
                       np.array([1.0, -1.0, 0.5, 0.0]),
                       np.array([2.0, 0.5, 1.5, 1.0]))
    # perturb the coupling heads so couplings are non-trivial
    def perturb(path, leaf):
        if any(getattr(p, "key", None) == "out" for p in path):
            k = jax.random.PRNGKey(hash(str(path)) % (2**31))
            return leaf + 0.01 * jax.random.normal(k, leaf.shape)
        return leaf
    params = jax.tree_util.tree_map_with_path(perturb, params)

    max_n, n = 4, 3
    a = jnp.zeros((1, max_n, max_n))
    for u, v in [(0, 1), (1, 2), (0, 2)]:
        a = a.at[0, u, v].set(1.0).at[0, v, u].set(1.0)
    gb = batch_from_dense(a, jnp.array([n]))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, max_n, 4))
    x = x * gb.node_mask[..., None]

    def f_flat(xf):
        x_full = jnp.zeros((1, max_n, 4)).at[0, :n].set(xf.reshape(n, 4))
        z, _ = flow_forward(params, cfg, x_full, gb)
        return z[0, :n].reshape(-1)

    jac = jax.jacfwd(f_flat)(x[0, :n].reshape(-1))
    sign, ld_auto = jnp.linalg.slogdet(jac)
    _, ld = flow_forward(params, cfg, x, gb)
    assert float(sign) == 1.0
    np.testing.assert_allclose(float(ld[0]), float(ld_auto), rtol=1e-4)


def test_actnorm_log_prob_padding_invariant():
    cfg = FlowConfig(node_dim=4, num_couplings=2, gnn_hidden=8, gnn_rounds=1,
                     use_actnorm=True)
    params = init_flow(jax.random.PRNGKey(4), cfg,
                       np.zeros(4), np.ones(4) * 1.7)
    gb, x = _batch(jax.random.PRNGKey(5))
    lp = log_prob(params, cfg, x, gb)
    pad = 3
    adj_w = jnp.pad(gb.adj, ((0, 0), (0, pad), (0, pad)))
    x_w = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    gb_w = batch_from_dense(adj_w, gb.n_node, x_w)
    lp_w = log_prob(params, cfg, x_w, gb_w)
    np.testing.assert_allclose(np.asarray(lp_w), np.asarray(lp), rtol=1e-5)
