"""Auto-encoder tests: decoder symmetry/range, loss learns, equivariance."""

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.config import AEConfig
from gnfx.graph import batch_from_dense
from gnfx.models import autoencoder as ae


def _batch(key, bsz=3, max_n=8):
    k1, k2 = jax.random.split(key)
    n_node = jax.random.randint(k1, (bsz,), 4, max_n + 1)
    a = (jax.random.uniform(k2, (bsz, max_n, max_n)) < 0.4).astype(jnp.float32)
    a = jnp.triu(a, 1)
    a = a + jnp.transpose(a, (0, 2, 1))
    return batch_from_dense(a, n_node)


def test_decoder_symmetry_and_range():
    cfg = AEConfig(embed_dim=6, feature_dim=6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6))
    probs = ae.decode_edges(None, cfg, x)
    p = np.asarray(probs)
    np.testing.assert_allclose(p, np.transpose(p, (0, 2, 1)), atol=1e-6)
    assert p.min() >= 0.0 and p.max() <= 1.0
    # identical embeddings -> distance 0 -> prob sigmoid(C) ~ 1
    x_same = jnp.zeros((1, 4, 6))
    p_same = np.asarray(ae.decode_edges(None, cfg, x_same))
    assert p_same.min() > 0.99


def test_mlp_decoder_symmetric_and_starts_at_dist():
    cfg = AEConfig(embed_dim=6, feature_dim=6, decoder="mlp", decoder_hidden=16)
    params = ae.init_autoencoder(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 6))
    # zero-init final layer: mlp decoder starts exactly at the dist decoder
    dist_cfg = AEConfig(embed_dim=6, feature_dim=6)
    np.testing.assert_allclose(
        np.asarray(ae.decode_edge_logits(params, cfg, x)),
        np.asarray(ae.decode_edge_logits(None, dist_cfg, x)), atol=1e-6)
    # after perturbing the decoder weights it must stay symmetric in (u, v)
    params["decoder"]["w"][-1] = jnp.ones_like(params["decoder"]["w"][-1])
    lg = np.asarray(ae.decode_edge_logits(params, cfg, x))
    np.testing.assert_allclose(lg, np.transpose(lg, (0, 2, 1)), atol=1e-5)


def test_mlp_decoder_learns_better_than_dist():
    # a fixed embedding whose edge rule is NOT a pure distance threshold:
    # only the decoder trains, so the mlp decoder must strictly beat dist
    import optax

    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (4, 8, 6))
    # label rule uses one coordinate's product sign — invisible to distance
    lab = (x[:, :, None, 0] * x[:, None, :, 0] > 0).astype(jnp.float32)
    lab = lab * (1.0 - jnp.eye(8)[None])
    gb = batch_from_dense(lab, jnp.full((4,), 8, jnp.int32))

    def fit(cfg):
        params = ae.init_autoencoder(jax.random.PRNGKey(10), cfg)
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits = ae.decode_edge_logits(p, cfg, x)
                m = ae.edge_pair_mask(gb)
                per = (jnp.maximum(logits, 0.0) - logits * lab
                       + jnp.log1p(jnp.exp(-jnp.abs(logits))))
                return jnp.sum(per * m) / jnp.sum(m)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        for _ in range(300):
            params, opt, loss = step(params, opt)
        return float(loss)

    dist_loss = fit(AEConfig(embed_dim=6, feature_dim=6))
    mlp_loss = fit(AEConfig(embed_dim=6, feature_dim=6, decoder="mlp",
                            decoder_hidden=32))
    assert mlp_loss < 0.5 * dist_loss, (dist_loss, mlp_loss)


def test_pairwise_sq_dists_matches_direct():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3))
    d2 = np.asarray(ae.pairwise_sq_dists(x))
    xn = np.asarray(x)
    direct = ((xn[:, :, None, :] - xn[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, direct, atol=1e-5)


def test_reconstruction_loss_decreases():
    cfg = AEConfig(embed_dim=8, feature_dim=8, gnn_hidden=32, gnn_rounds=2)
    gb = _batch(jax.random.PRNGKey(2))
    params = ae.init_autoencoder(jax.random.PRNGKey(3), cfg)
    feats = ae.random_node_features(jax.random.PRNGKey(4), gb, cfg.feature_dim)

    import optax
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: ae.reconstruction_loss(p, cfg, feats, gb), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.7 * first, (first, float(loss))


def test_decode_to_adjacency_bernoulli_sampling():
    cfg = AEConfig(embed_dim=4, feature_dim=4, decoder_c=1.0)
    gb = _batch(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (3, 8, 4)) * gb.node_mask[..., None]
    hard = np.asarray(ae.decode_to_adjacency(None, cfg, x, gb,
                                             key=jax.random.PRNGKey(13)))
    np.testing.assert_array_equal(hard, np.transpose(hard, (0, 2, 1)))
    assert np.all(np.diagonal(hard, axis1=1, axis2=2) == 0)
    m = np.asarray(gb.node_mask)
    assert np.all(hard * (1 - m[:, :, None]) == 0)
    assert set(np.unique(hard)) <= {0.0, 1.0}
    # calibration: mean sampled edge rate over many draws ~ mean probability
    probs = np.asarray(ae.decode_edges(None, cfg, x))
    pm = np.asarray(ae.edge_pair_mask(gb))
    draws = [np.asarray(ae.decode_to_adjacency(
        None, cfg, x, gb, key=jax.random.PRNGKey(100 + i))) for i in range(64)]
    rate = np.mean([np.sum(d * pm) / np.sum(pm) for d in draws])
    expect = np.sum(probs * pm) / np.sum(pm)
    assert abs(rate - expect) < 0.05, (rate, expect)


def test_decode_to_adjacency_masked_symmetric():
    cfg = AEConfig(embed_dim=4, feature_dim=4)
    gb = _batch(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 8, 4)) * gb.node_mask[..., None]
    hard = np.asarray(ae.decode_to_adjacency(None, cfg, x, gb))
    np.testing.assert_array_equal(hard, np.transpose(hard, (0, 2, 1)))
    assert np.all(np.diagonal(hard, axis1=1, axis2=2) == 0)
    m = np.asarray(gb.node_mask)
    assert np.all(hard * (1 - m[:, :, None]) == 0)


def test_canonicalize_center():
    cfg = AEConfig(embed_dim=4, feature_dim=4, canonicalize="center",
                   canon_jitter=0.0)
    gb = _batch(jax.random.PRNGKey(21))
    x = jax.random.normal(jax.random.PRNGKey(22), (3, 8, 4)) * gb.node_mask[..., None]
    y = np.asarray(ae.canonicalize_embeddings(x, cfg, gb.node_mask))
    m = np.asarray(gb.node_mask)
    # masked per-graph mean is exactly 0; padding stays exactly 0
    means = np.sum(y * m[..., None], axis=1) / np.sum(m, axis=1)[:, None]
    np.testing.assert_allclose(means, 0.0, atol=1e-6)
    assert np.all(y * (1 - m[:, :, None]) == 0)
    # decode is translation-invariant: logits unchanged on real pairs
    lx = np.asarray(ae.decode_edge_logits(None, cfg, x))
    ly = np.asarray(ae.decode_edge_logits(None, cfg, y + np.sum(x * m[..., None], axis=1, keepdims=True) / np.sum(m, axis=1)[:, None, None]))
    pm = np.asarray(ae.edge_pair_mask(gb))
    np.testing.assert_allclose(lx * pm, ly * pm, atol=1e-4)
    # jitter keeps padding zero and stays small
    cfg_j = AEConfig(embed_dim=4, feature_dim=4, canonicalize="center",
                     canon_jitter=0.05)
    yj = np.asarray(ae.canonicalize_embeddings(x, cfg_j, gb.node_mask,
                                               jax.random.PRNGKey(23)))
    assert np.all(yj * (1 - m[:, :, None]) == 0)
    assert np.max(np.abs(yj - y)) < 0.5
    # "none" is the identity
    cfg_n = AEConfig(embed_dim=4, feature_dim=4)
    np.testing.assert_array_equal(
        np.asarray(ae.canonicalize_embeddings(x, cfg_n, gb.node_mask)), np.asarray(x))


def test_canonicalize_pca_rank_deficient_jitter_floor():
    """Centered n-point clouds in R^D have rank <= n-1: with D >= n the
    trailing principal dims are EXACTLY zero without jitter (which once
    initialized ActNorm with a ~1/eps scale and blew up training at step 0
    — regression). Jitter must floor every dim's std."""
    D = 12
    cfg = AEConfig(embed_dim=D, feature_dim=D, canonicalize="pca",
                   canon_jitter=0.05)
    gb = _batch(jax.random.PRNGKey(41))   # 8-node graphs < D dims
    m = np.asarray(gb.node_mask)
    x = jax.random.normal(jax.random.PRNGKey(42), (3, 8, D)) * gb.node_mask[..., None]
    y0 = np.asarray(ae.canonicalize_embeddings(x, cfg, gb.node_mask))  # no key
    for b in range(3):
        stds = np.std(y0[b][m[b] > 0], axis=0)
        assert stds[-1] < 1e-5    # the degenerate geometry is real
    yj = np.asarray(ae.canonicalize_embeddings(x, cfg, gb.node_mask,
                                               jax.random.PRNGKey(43)))
    flat = np.concatenate([yj[b][m[b] > 0] for b in range(3)])
    assert np.min(np.std(flat, axis=0)) > 0.01   # jitter floors every dim


def test_train_flow_actnorm_pca_finite():
    """train_flow's ActNorm init must use jittered canonicalized stats:
    with pca + D >= max_nodes the jitterless trailing-dim std is ~0 and the
    first step NaN'd before the fix. 3 steps, loss must stay finite."""
    from gnfx.config import PRESETS
    from gnfx.train.loop import train_autoencoder, train_flow
    import dataclasses

    cfg = PRESETS["smoke"]
    D = 10   # > min graph size (smoke graphs go down to ~6 nodes)
    cfg = dataclasses.replace(
        cfg,
        ae=dataclasses.replace(cfg.ae, embed_dim=D, feature_dim=D,
                               canonicalize="pca", train_steps=30),
        flow=dataclasses.replace(cfg.flow, node_dim=D, num_couplings=2,
                                 use_actnorm=True),
        train=dataclasses.replace(cfg.train, num_steps=4, log_every=1,
                                  eval_every=10**9, checkpoint_every=10**9,
                                  eval_samples=0, steps_per_call=1),
    )
    from gnfx.data import create_dataset, dataset_to_arrays
    graphs, _, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed,
                                      num_graphs=cfg.data.num_graphs)
    adj, n = dataset_to_arrays(graphs, max_n)
    ae_params = train_autoencoder(cfg, adj, n)
    flow_params = train_flow(cfg, adj, n, ae_params, full_graph=True)
    flat = jax.tree_util.tree_leaves(flow_params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)


def test_canonicalize_pca_rigid_invariance():
    """canonicalize(R x + t) == canonicalize(x) for any rotation R and
    translation t — the rigid nuisance is fully removed."""
    cfg = AEConfig(embed_dim=4, feature_dim=4, canonicalize="pca",
                   canon_jitter=0.0)
    gb = _batch(jax.random.PRNGKey(31))
    m = np.asarray(gb.node_mask)
    x = jax.random.normal(jax.random.PRNGKey(32), (3, 8, 4)) * gb.node_mask[..., None]
    # random orthogonal map per batch (shared is fine) + translation
    q, _ = np.linalg.qr(np.random.RandomState(0).randn(4, 4))
    t = np.random.RandomState(1).randn(1, 1, 4)
    xr = (np.asarray(x) @ q + t) * m[..., None]
    y = np.asarray(ae.canonicalize_embeddings(x, cfg, gb.node_mask))
    yr = np.asarray(ae.canonicalize_embeddings(jnp.asarray(xr), cfg, gb.node_mask))
    np.testing.assert_allclose(yr, y, atol=1e-4)
    # canonical form: axis-aligned (diagonal masked covariance, descending)
    for b in range(3):
        pts = y[b][m[b] > 0]
        cov = pts.T @ pts / len(pts)
        off = cov - np.diag(np.diag(cov))
        assert np.max(np.abs(off)) < 1e-4
        d = np.diag(cov)
        assert np.all(d[:-1] >= d[1:] - 1e-5)
    # padding stays exactly 0; decode logits unchanged on real pairs
    assert np.all(y * (1 - m[:, :, None]) == 0)
    lx = np.asarray(ae.decode_edge_logits(None, cfg, x))
    ly = np.asarray(ae.decode_edge_logits(None, cfg, jnp.asarray(y)))
    pm = np.asarray(ae.edge_pair_mask(gb))
    np.testing.assert_allclose(lx * pm, ly * pm, atol=1e-4)


def test_bridge_weight_focuses_long_edges():
    """bridge_weight > 0: loss changes only through TRUE-edge weights that
    grow with embedding distance; padding slots stay irrelevant; grads are
    finite (the distance boost is stop-gradiented)."""
    cfg0 = AEConfig(embed_dim=8, feature_dim=8, gnn_hidden=32, gnn_rounds=2)
    cfgb = AEConfig(embed_dim=8, feature_dim=8, gnn_hidden=32, gnn_rounds=2,
                    bridge_weight=2.0)
    gb = _batch(jax.random.PRNGKey(11))
    params = ae.init_autoencoder(jax.random.PRNGKey(12), cfg0)
    feats = ae.random_node_features(jax.random.PRNGKey(13), gb,
                                    cfg0.feature_dim)

    l0, _ = ae.reconstruction_loss(params, cfg0, feats, gb)
    lb, _ = ae.reconstruction_loss(params, cfgb, feats, gb)
    assert np.isfinite(float(l0)) and np.isfinite(float(lb))
    assert float(l0) != float(lb)  # the boost actually reweights

    (lossb, _), grads = jax.value_and_grad(
        lambda p: ae.reconstruction_loss(p, cfgb, feats, gb), has_aux=True
    )(params)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # padding invariance: garbage in padded feature slots must not change
    # the bridge-weighted loss (mask kills both the pair weights and the
    # distance boost on padded pairs)
    noise = jax.random.normal(jax.random.PRNGKey(14), feats.shape)
    feats_dirty = feats + noise * (1.0 - gb.node_mask[..., None])
    lb2, _ = ae.reconstruction_loss(params, cfgb, feats_dirty, gb)
    np.testing.assert_allclose(float(lb), float(lb2), rtol=1e-6)


def test_bridge_mode_tri_targets_triangle_free_edges():
    """bridge_mode="tri": a barbell graph's middle edge (no common
    neighbour) is the only boosted pair — losing it must cost more than
    losing a triangle edge, all else equal."""
    import networkx as nx
    from gnfx.graph import networkx_to_arrays

    g = nx.barbell_graph(4, 0)   # two K4s joined by one bridge edge
    adj, n = networkx_to_arrays([g], 8)
    gb = batch_from_dense(adj, n)
    cfg = AEConfig(embed_dim=4, feature_dim=4, gnn_hidden=16, gnn_rounds=1,
                   bridge_weight=8.0, bridge_mode="tri")
    cfg0 = AEConfig(embed_dim=4, feature_dim=4, gnn_hidden=16, gnn_rounds=1)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    feats = ae.random_node_features(jax.random.PRNGKey(1), gb,
                                    cfg.feature_dim)
    l_tri, _ = ae.reconstruction_loss(params, cfg, feats, gb)
    l_plain, _ = ae.reconstruction_loss(params, cfg0, feats, gb)
    assert np.isfinite(float(l_tri))
    assert float(l_tri) != float(l_plain)

    # the boost matrix itself: only the bridge pair is triangle-free
    labels = np.asarray(gb.adj)[0]
    common = labels @ labels
    bridge = (labels > 0.5) & (common < 0.5)
    iu, iv = np.nonzero(np.triu(bridge, 1))
    assert len(iu) == 1  # exactly the barbell bridge
    assert {int(g.degree(int(iu[0]))), int(g.degree(int(iv[0])))} == {4}


def test_break_triangles_repair():
    """break_triangles_np removes lowest-probability triangle edges until
    none remain, never touches padded slots, and composed with
    connect_components (break THEN connect) yields a connected
    triangle-free graph."""
    import networkx as nx

    from gnfx.graph import networkx_to_arrays
    from gnfx.sample import break_triangles_np, connect_components_np

    rng = np.random.default_rng(0)
    for _ in range(10):
        g = nx.gnp_random_graph(10, 0.45, seed=int(rng.integers(1 << 30)))
        adj, n = networkx_to_arrays([g], 12)
        probs = rng.random((12, 12)); probs = (probs + probs.T) / 2
        a = break_triangles_np(adj[0], probs, 10)
        gg = nx.from_numpy_array(a[:10, :10])
        assert sum(nx.triangles(gg).values()) == 0
        assert a[10:, :].sum() == 0 and a[:, 10:].sum() == 0
        a2 = connect_components_np(a, probs, 10)
        gg2 = nx.from_numpy_array(a2[:10, :10])
        assert sum(nx.triangles(gg2).values()) == 0  # connect never closes
        assert nx.is_connected(gg2)
