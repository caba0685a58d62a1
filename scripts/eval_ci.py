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

from gnfx.eval.mmd import evaluate_generated
from gnfx.sample import sample_graphs
from scripts.generate import load_eval_data, load_run


def main(argv):
    seeds = 5
    argv = list(argv)
    for a in list(argv):
        if a.startswith("seeds="):
            seeds = int(a.split("=")[1])
            argv.remove(a)
    if seeds < 2:
        raise SystemExit("eval_ci needs seeds>=2 (a sd over one draw is "
                         "undefined); use scripts/generate.py for one seed")
    cfg, params, step, sampling, num_samples, seed0, run_dir = load_run(argv)
    _, test_graphs, max_nodes, size_dist, n = load_eval_data(cfg, num_samples)

    rows = []
    for k in range(seeds):
        sampled = sample_graphs(
            params["flow"], params["ae"], cfg.flow, cfg.ae, n, size_dist,
            max_nodes, seed=seed0 + 1000 * k,
            batch_size=cfg.data.batch_size, **sampling,
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
    # write next to the params that produced it (run_dir is the directory
    # load_run resolved from the CLI arg, NOT cfg.name — a copied/renamed
    # run dir must not overwrite the original's CI file)
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "eval_ci.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
