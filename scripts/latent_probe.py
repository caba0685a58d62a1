"""Latent/spread diagnostic for a trained two-stage run (CPU-friendly).

Question it answers (motivated by protein-pca2@60k: generated decode
density is wildly off — mean edges 136/2989/20478 at T=1.0/0.8/0.6 vs
real ~975): is the flow's learned density actually matched to the real
embedding clouds, or underfit?

Two measurements, per checkpoint step:

1. FORWARD: push the real TRAIN graphs' frozen-encoder embeddings (the
   training distribution, jittered like training) through flow_forward.
   If the model were fit, those latents would be ≈ N(0, I) on real node
   slots (per-dim std 1, mean 0). std != 1 means the sampler's T=1 draws
   live at the wrong radius — the community-small flagship measured
   0.97–1.02 here (round-4 note: recalibration is a dead end THERE
   because nothing was off).
2. INVERSE: draw z ~ N(0,I)·T, invert, and compare the generated
   embedding clouds' geometry (RMS radius, mean pairwise distance) to
   the real clouds'. Pairwise distance is what the distance decoder
   thresholds, so a ratio < 1 here IS the over-dense decode.

Usage: python scripts/latent_probe.py <run-name> [steps=12004,60000]
Writes runs/<run>/latent_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gnfx.config import from_dict
from gnfx.data import create_dataset, dataset_to_arrays
from gnfx.graph import batch_from_dense
from gnfx.models import autoencoder as ae_mod
from gnfx.models.flow import (flow_forward, flow_inverse, init_flow,
                              sample_latents)
from gnfx.train.checkpoint import _ckpt_steps, restore_checkpoint
from gnfx.train.loop import compute_embeddings, make_optimizer


def _cloud_stats(emb, mask):
    """RMS radius about the cloud centroid + mean real-pair distance."""
    radii, pair = [], []
    for x, m in zip(emb, mask):
        pts = x[m > 0.5]
        if len(pts) < 2:
            continue
        c = pts.mean(0)
        radii.append(float(np.sqrt(((pts - c) ** 2).sum(-1).mean())))
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        iu = np.triu_indices(len(pts), 1)
        pair.append(float(d[iu].mean()))
    return float(np.mean(radii)), float(np.mean(pair))


def main(argv):
    run = argv[0] if argv and "=" not in argv[0] else "protein-pca2"
    steps_arg = None
    for a in argv:
        if a.startswith("steps="):
            steps_arg = [int(s) for s in a.split("=")[1].split(",")]
    run_dir = os.path.join("runs", run)
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = from_dict(json.load(f))
    train_g, _, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed,
                                       num_graphs=cfg.data.num_graphs)
    adj, n_node = dataset_to_arrays(train_g, max_n)
    # Whole static-shape batches only; truncate BEFORE the real-cloud stats
    # so real and generated ratios share the exact same graph set (a dropped
    # tail must not skew one side's denominator).
    bsz = cfg.data.batch_size
    nb = (len(adj) // bsz) * bsz
    if nb == 0:
        raise SystemExit(f"latent_probe: need >= batch_size={bsz} train "
                         f"graphs, have {len(adj)}")
    if nb < len(adj):
        print(f"[probe] truncating {len(adj)} -> {nb} graphs "
              "(whole batches; real/generated stats share this set)",
              flush=True)
        adj, n_node = adj[:nb], n_node[:nb]
    ae_t = ae_mod.init_autoencoder(jax.random.PRNGKey(0), cfg.ae)
    flow_t0 = init_flow(jax.random.PRNGKey(0), cfg.flow)
    try:
        ae_p = restore_checkpoint(os.path.join(run_dir, "params_ae"),
                                  {"ae": ae_t})[0]["ae"]
    except FileNotFoundError:
        # final params dir holds {"ae", "flow"} — restore with the full
        # template (a partial template silently misaligns the arrays)
        ae_p = restore_checkpoint(os.path.join(run_dir, "params"),
                                  {"ae": ae_t, "flow": flow_t0})[0]["ae"]

    # real training-distribution embeddings (jittered, as the flow saw them)
    emb = compute_embeddings(ae_p, cfg, adj, n_node, jitter=True)
    mask = (np.arange(max_n)[None] < n_node[:, None]).astype(np.float32)
    real_radius, real_pair = _cloud_stats(emb, mask)

    flow_t = init_flow(jax.random.PRNGKey(0), cfg.flow)
    tx = make_optimizer(cfg.train.lr, cfg.train.lr_warmup,
                        cfg.train.grad_clip, cfg.train.num_steps,
                        cfg.train.weight_decay)
    opt_t = tx.init(flow_t)
    tmpl = ((flow_t, opt_t, flow_t) if cfg.train.ema_decay > 0.0
            else (flow_t, opt_t))
    ckpt_dir = os.path.join(run_dir, "ckpt")
    steps = steps_arg or [_ckpt_steps(ckpt_dir)[-1]]

    out = {"run": run, "real_cloud_rms_radius": round(real_radius, 4),
           "real_mean_pair_dist": round(real_pair, 4), "per_step": []}
    # generation-mode flows condition message passing on the FULLY-
    # CONNECTED graph (train/sample parity — gnfx/train/loop.py:222,
    # gnfx/sample.py); feeding the data adjacency here gives nonsense
    fwd = jax.jit(
        lambda p, x, g: flow_forward(p, cfg.flow, x, g.fully_connected())[0])
    inv = jax.jit(
        lambda p, z, g: flow_inverse(p, cfg.flow, z, g.fully_connected())[0])
    for s in steps:
        state, _ = restore_checkpoint(ckpt_dir, tmpl, step=s)
        flow_p = state[0]
        # 1. forward: real embeddings -> latents, moments on real slots
        zs = []
        for i in range(0, len(adj) - bsz + 1, bsz):
            gb = batch_from_dense(adj[i:i + bsz], n_node[i:i + bsz])
            zs.append(np.asarray(fwd(flow_p, emb[i:i + bsz], gb)))
        z = np.concatenate(zs, 0)
        m = mask[: len(z), :, None]
        nreal = m.sum()
        z_mean = float((z * m).sum() / (nreal * z.shape[-1]))
        z_std = float(np.sqrt((((z - z_mean) * m) ** 2).sum()
                              / (nreal * z.shape[-1])))
        per_dim_std = np.sqrt(((z * m) ** 2).sum((0, 1)) / nreal)
        # 2. inverse: N(0,I)·T latents -> generated embedding geometry
        gen = {}
        for T in (1.0, 0.9, 0.8):
            gs, key = [], jax.random.PRNGKey(123)
            for i in range(0, len(adj) - bsz + 1, bsz):
                # nodes carry node_dim so sample_latents draws D dims
                gb = batch_from_dense(
                    adj[i:i + bsz], n_node[i:i + bsz],
                    nodes=np.zeros((bsz, max_n, cfg.flow.node_dim),
                                   np.float32))
                key, k = jax.random.split(key)
                zT = sample_latents(k, gb) * T
                gs.append(np.asarray(inv(flow_p, zT, gb)))
            g_emb = np.concatenate(gs, 0)
            r, p = _cloud_stats(g_emb, mask[: len(g_emb)])
            gen[str(T)] = {"cloud_rms_radius": round(r, 4),
                           "mean_pair_dist": round(p, 4),
                           "pair_dist_ratio_vs_real": round(p / real_pair, 4)}
        out["per_step"].append({
            "step": s,
            "real_latent_mean": round(z_mean, 4),
            "real_latent_std": round(z_std, 4),
            "real_latent_per_dim_std_min": round(float(per_dim_std.min()), 4),
            "real_latent_per_dim_std_max": round(float(per_dim_std.max()), 4),
            "generated": gen,
        })
        print("[latent_probe]", json.dumps(out["per_step"][-1]), flush=True)
    with open(os.path.join(run_dir, "latent_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[latent_probe] real cloud: radius", real_radius,
          "pair", real_pair, flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
