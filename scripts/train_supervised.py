"""Supervised GRevNet node classification CLI (BASELINE config 3).

Usage:
    python scripts/train_supervised.py [cora|pubmed|cora-small] [key=value ...]

Trains the invertible-GNN classifier AND the same-budget plain-GNN parity
baseline, reporting both test accuracies (the paper's Table-1 comparison,
SURVEY.md §6)."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gnfx.data.citation import load_citation
from gnfx.models.supervised import (
    SupervisedConfig,
    citation_to_batch,
    train_gnn_baseline,
    train_supervised,
)
from gnfx.train.metrics import MetricsWriter


def main(argv):
    name = "cora"
    overrides = {}
    for a in argv:
        if a == "debug_nans=1":
            # numerical tripwire (gnfx/utils/debug.py): NaNs raise at the
            # producing op — the tool for diagnosing CE-loss divergences
            # like the round-1 affine-coupling blowup
            from gnfx.utils.debug import enable_nan_checks
            enable_nan_checks()
            print("[gnfx] jax_debug_nans ON (slow; debugging only)",
                  flush=True)
        elif "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = v
        else:
            name = a

    g = load_citation(name)
    gb, labels, masks = citation_to_batch(g)
    cfg = SupervisedConfig(num_features=g.features.shape[1],
                           num_classes=g.num_classes)
    for k, v in overrides.items():
        cur = getattr(cfg, k)
        cfg = dataclasses.replace(
            cfg, **{k: type(cur)(v) if not isinstance(cur, bool)
                    else v.lower() in ("1", "true")}
        )

    run_dir = os.path.join("runs", f"supervised-{name}")
    os.makedirs(run_dir, exist_ok=True)
    metrics = MetricsWriter(os.path.join(run_dir, "metrics.jsonl"))
    print(f"[gnfx] supervised {name}: N={g.num_nodes} C={g.num_classes} "
          f"F={g.features.shape[1]} padded={gb.max_nodes} "
          f"backend={jax.default_backend()}", flush=True)

    t0 = time.time()
    _, grevnet = train_supervised(cfg, gb, labels, masks, metrics=metrics)
    t_grevnet = time.time() - t0
    print(f"[gnfx] GRevNet done in {t_grevnet:.1f}s: {grevnet}", flush=True)

    t0 = time.time()
    baseline = train_gnn_baseline(cfg, gb, labels, masks)
    print(f"[gnfx] GNN baseline done in {time.time()-t0:.1f}s: {baseline}",
          flush=True)

    results = {
        "grevnet": grevnet, "gnn_baseline": baseline,
        "gap_pts": round(100 * (grevnet["test_acc"] - baseline["test_acc"]), 2),
        "grevnet_train_s": round(t_grevnet, 1),
    }
    with open(os.path.join(run_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"[gnfx] FINAL {json.dumps(results)}", flush=True)
    metrics.close()
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
