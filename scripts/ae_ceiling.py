"""AE reconstruction-ceiling measurement (CPU-friendly).

Usage:
    python scripts/ae_ceiling.py <preset> [ae.key=value ...]

Encodes + decodes the HELD-OUT test graphs (no flow involved) and reports
the MMD protocol of the reconstructions vs the originals. This is an upper
bound on generation quality for the two-stage pipeline (BASELINE.md quality
note: the AE ceiling, not the flow, bound community-small in rounds 1-2) —
measure it before spending flow steps on a new AE config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gnfx.config import load_config
from gnfx.data import create_dataset, dataset_to_arrays
from gnfx.eval.mmd import clustering_stats, degree_stats, orbit_stats
from gnfx.eval.selection import frac_connected
from gnfx.graph import arrays_to_networkx, batch_from_dense
from gnfx.models import autoencoder as ae
from gnfx.train.loop import train_autoencoder


def main(argv):
    # ae_from=<run>: measure an EXISTING run's AE instead of training one
    # (attribution: per-seed AE retraining makes pipeline seed variance
    # conflate stage-1 and stage-2 luck)
    # quick=1: one feature draw, no orbit MMD, test split capped at 40
    # graphs — for big-N (protein) config sweeps where host orbit counting
    # dominates wall clock (round-10 lesson).
    # thresholds=0.5,0.7: decode-threshold sweep — the pipeline selects the
    # threshold on the train split, so the ceiling at the BEST threshold is
    # the operative bound, not the 0.5 default (a bridge-weighted AE may
    # trade its extra edge mass away at a higher threshold).
    ae_from = None
    quick = False
    resume = False
    thresholds = (0.5,)
    for a in list(argv):
        if a.startswith("ae_from="):
            ae_from = a.split("=", 1)[1]
            argv = [x for x in argv if x is not a]
        elif a.startswith("quick="):
            quick = a.split("=", 1)[1] in ("1", "true")
            argv = [x for x in argv if x is not a]
        elif a.startswith("resume="):
            # long screens (protein 40k AE) checkpoint mid-stage via
            # train_autoencoder's ckpt_ae path and survive requeue/reimage;
            # pair with name= + train.checkpoint_dir= so the screen's
            # checkpoints never collide with a real run's
            resume = a.split("=", 1)[1] in ("1", "true")
            argv = [x for x in argv if x is not a]
        elif a.startswith("thresholds="):
            thresholds = tuple(float(t) for t in a.split("=", 1)[1].split(","))
            argv = [x for x in argv if x is not a]
    cfg = load_config(argv)
    train_g, test_g, max_n = create_dataset(
        cfg.data.dataset, seed=cfg.data.seed, num_graphs=cfg.data.num_graphs
    )
    adj_tr, n_tr = dataset_to_arrays(train_g, max_n)
    if quick:
        test_g = test_g[:40]
    adj_te, n_te = dataset_to_arrays(test_g, max_n)

    t0 = time.time()
    if ae_from is not None:
        from gnfx.train.checkpoint import restore_checkpoint

        tpl = {"ae": ae.init_autoencoder(jax.random.PRNGKey(0), cfg.ae)}
        src = os.path.join("runs", ae_from, "params_ae")
        if not os.path.isdir(src):
            src = os.path.join("runs", ae_from, "params")
        params = restore_checkpoint(src, tpl)[0]["ae"]
        print(f"[ceiling] AE loaded from {src}", flush=True)
    else:
        params = train_autoencoder(cfg, adj_tr, n_tr, resume=resume)
    train_s = time.time() - t0

    gb = batch_from_dense(adj_te, n_te)
    # held-out BCE at one feature draw, for decoder comparisons
    feats0 = ae.random_node_features(jax.random.PRNGKey(99), gb,
                                     cfg.ae.feature_dim)
    bce, _ = ae.reconstruction_loss(params, cfg.ae, feats0, gb)
    draws = 1 if quick else 3
    per_thr = {}
    for thr in thresholds:
        mmds = []
        for s in range(draws):  # average over encoder feature draws
            feats = ae.random_node_features(jax.random.PRNGKey(s), gb,
                                            cfg.ae.feature_dim)
            emb = ae.encode(params, cfg.ae, feats, gb)
            probs = np.asarray(ae.decode_edges(params, cfg.ae, emb))
            a = (np.triu(probs > thr, 1)).astype(np.float32)
            a = a + a.transpose(0, 2, 1)
            recon = arrays_to_networkx(a, np.asarray(n_te))
            mmds.append((degree_stats(test_g, recon),
                         clustering_stats(test_g, recon),
                         0.0 if quick else orbit_stats(test_g, recon),
                         float(np.mean([g.number_of_edges() for g in recon])),
                         frac_connected(recon)))
        per_thr[thr] = np.mean(np.array(mmds), axis=0)
    # headline row: the threshold with the lowest deg+clus+orb sum (the
    # pipeline's train-split selection would pick it)
    best_thr = min(per_thr, key=lambda t: float(np.sum(per_thr[t][:3])))
    m = per_thr[best_thr]
    out = {"preset": cfg.name, "decoder": cfg.ae.decoder,
           "decoder_c": cfg.ae.decoder_c, "embed_dim": cfg.ae.embed_dim,
           "ae_steps": cfg.ae.train_steps,
           "bridge_weight": cfg.ae.bridge_weight, "quick": quick,
           "threshold": best_thr,
           "per_threshold": {str(t): [round(float(x), 4) for x in v]
                             for t, v in per_thr.items()} if len(per_thr) > 1
                            else None,
           "deg": round(float(m[0]), 4), "clus": round(float(m[1]), 4),
           "orb": round(float(m[2]), 4), "mean_edges": round(float(m[3]), 1),
           "frac_connected": round(float(m[4]), 4),
           "true_frac_connected": round(frac_connected(test_g), 4),
           "true_mean_edges": round(
               float(np.mean([g.number_of_edges() for g in test_g])), 1),
           "heldout_bce": round(float(bce), 4),
           "train_s": round(train_s, 1)}
    print("[ceiling]", json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
