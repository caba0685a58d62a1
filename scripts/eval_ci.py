"""Monte-Carlo error bars for a run's MMD numbers.

Usage:
    python scripts/eval_ci.py <run-name> [seeds=K] [num_samples=N] [step=K]
        [any generate.py arg]

BASELINE.json's binding quality target is parity "within Monte-Carlo
error", so a single-seed MMD row is not enough to claim it. This repeats
the final generation + MMD protocol of `scripts/generate.py` over K
independent sampling seeds (same params, same train-split-selected
hyperparameters) and reports mean ± sd for each metric. Model parameters
are restored once; only the sampling seed varies.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gnfx.data import create_dataset, dataset_to_arrays, empirical_size_distribution
from gnfx.eval.mmd import evaluate_generated
from gnfx.sample import sample_graphs
from scripts.generate import load_run


def main(argv):
    seeds = 5
    argv = list(argv)
    for a in list(argv):
        if a.startswith("seeds="):
            seeds = int(a.split("=")[1])
            argv.remove(a)
    cfg, params, step, sampling, num_samples, seed0 = load_run(argv)
    train_graphs, test_graphs, max_nodes = create_dataset(
        cfg.data.dataset, seed=cfg.data.seed, num_graphs=cfg.data.num_graphs
    )
    adj_tr, n_tr = dataset_to_arrays(train_graphs, max_nodes)
    size_dist = empirical_size_distribution(n_tr, max_nodes)
    n = num_samples or max(len(test_graphs) * 4, 64)

    rows = []
    for k in range(seeds):
        sampled = sample_graphs(
            params["flow"], params["ae"], cfg.flow, cfg.ae, n, size_dist,
            max_nodes, seed=seed0 + 1000 * k,
            batch_size=cfg.data.batch_size,
            temperature=sampling["temperature"],
            threshold=sampling["threshold"],
            connect_isolated=sampling["connect_isolated"],
            edge_sample=sampling["edge_sample"],
        )
        res = evaluate_generated(test_graphs, sampled)
        rows.append(res)
        print(f"[ci] seed {seed0 + 1000 * k}:",
              json.dumps({k2: round(v, 4) if isinstance(v, float) else v
                          for k2, v in res.items()}), flush=True)

    out = {"run": cfg.name, "step": step, "seeds": seeds, "num_samples": n,
           **sampling}
    for key in rows[0]:
        vals = np.array([r[key] for r in rows], dtype=np.float64)
        out[key] = round(float(vals.mean()), 4)
        out[key + "_sd"] = round(float(vals.std(ddof=1)), 4)
    print("[ci] SUMMARY", json.dumps(out), flush=True)
    run_dir = os.path.join("runs", cfg.name)
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "eval_ci.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
