"""Protein sampling-throughput row at the final model/config (verdict #8).

The north-star graphs/s was measured at tiny shapes (929.6) and once at
N=512 with the 5k-smoke config (6.35); this re-measures at the final
extended-horizon protein model with its sweep-selected decode: one warmup
batch (compile + dispatch-cold excluded), then a timed 64-graph sustained
run. Appends to runs/scaling_tpu.json and commits. No MMD eval (host
orbit at N=512 costs tens of minutes and measures nothing about
throughput).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

if time.time() > 1787262300:  # 21:45 UTC: wind-down margin
    print("[154] SKIPPED: past wind-down margin", flush=True)
else:
    from scripts.generate import load_run
    from gnfx.data import (create_dataset, dataset_to_arrays,
                           empirical_size_distribution)
    from gnfx.sample import sample_graphs

    cfg, params, step, sampling, _, _, _ = load_run(["protein-pca2"])
    train_g, _, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed,
                                       num_graphs=cfg.data.num_graphs)
    _, n_tr = dataset_to_arrays(train_g, max_n)
    size_dist = empirical_size_distribution(n_tr, max_n)
    kw = dict(size_dist=size_dist, max_nodes=max_n, seed=11,
              batch_size=cfg.data.batch_size, **sampling)
    sample_graphs(params["flow"], params["ae"], cfg.flow, cfg.ae,
                  cfg.data.batch_size, **kw)  # warmup (compile)
    n = 64
    t0 = time.time()
    sample_graphs(params["flow"], params["ae"], cfg.flow, cfg.ae, n, **kw)
    dt = time.time() - t0
    row = {"config": "protein-pca2 (extended horizon)", "n_nodes": int(max_n),
           "step": int(step), "num_samples": n,
           "graphs_per_s": round(n / dt, 3),
           "sampling": sampling, "measured": time.strftime("%F %T")}
    path = "/root/repo/runs/scaling_tpu.json"
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc.setdefault("protein_rows", []).append(row)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print("[154]", json.dumps(row), flush=True)
    subprocess.run(["git", "add", "runs/scaling_tpu.json"], cwd="/root/repo")
    subprocess.run(["git", "commit", "-m",
                    "protein sampling throughput at the extended horizon",
                    "--", "runs/scaling_tpu.json"], cwd="/root/repo")
