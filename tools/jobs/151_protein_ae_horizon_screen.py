"""Protein stage-1 ceiling attack (round-4 verdict #1, screen leg).

The measured ceiling (runs/protein-pca/ae_ceiling.json: deg 0.6255 /
clus 0.4134 at thr 0.7, quick mode) binds everything downstream of the
15k-step c=100 AE. The verdict's untried-lever list starts with "much
longer AE horizon" (community needed 20k steps at N<=20; protein got 15k
at N=512). This trains a FRESH dist-decoder AE — same config and seeds
as protein-pca, horizon extended — with mid-stage checkpoints + in-job
commits, then measures the reconstruction ceiling in the SAME quick mode
and thresholds as the committed baseline, appending the row to
runs/protein_ae_sweep.json (the round-3 c-sweep artifact) and committing.

Final-round budget honesty: the flow horizon extension (next job) reuses
the 15k AE its 60k checkpoint was trained on — a screen winner cannot
feed a flow retrain this round, so the screen is sized not to crowd out
the flow jobs: 25k steps by default (a 10k-step delta on the horizon
axis answers "does the ceiling still fall past 15k?"), full 40k only if
the queue is ahead of schedule, self-skip with a dated note if behind.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

WINDDOWN = 1787262900  # 21:55 UTC 2026-08-20 (final-round queue hard end,
                       # retimed: the round actually ends ~22:10, not 23:40)
EVAL_MARGIN_S = 1200   # ceiling eval + commit
RATE = 6.5             # conservative AE steps/s at N=512 (measured ~7)

budget_s = WINDDOWN - 7200 - time.time() - EVAL_MARGIN_S  # leave >=2 h for flow ext+sweep
steps = int(min(40000, budget_s * RATE))
if steps < 22000:
    print(f"[151] SKIPPED {time.strftime('%F %T')}: affordable AE horizon "
          f"{steps} < 22k steps — a sub-22k screen cannot answer the "
          ">=25k-horizon question, and the remaining wall clock is owed to "
          "the protein flow extension (verdict #1's quotable row). "
          "Recorded as not-run.", flush=True)
else:
    steps = max(25000, min(steps, 40000)) if steps >= 25000 else steps
    print(f"[151] AE horizon screen at {steps} steps "
          f"(budget {budget_s:.0f}s)", flush=True)
    from scripts.ae_ceiling import main

    out = main([
        "protein-pca", "name=protein-ae-horizon",
        "train.checkpoint_dir=runs/protein-ae-horizon/ckpt",
        f"ae.train_steps={steps}",
        "train.git_commit_s=900", "resume=1",
        "quick=1", "thresholds=0.3,0.5,0.7",
    ])
    out["note"] = (f"horizon screen (15k->{steps}); baseline 15k ceiling "
                   "deg 0.6255/clus 0.4134 (runs/protein-pca/ae_ceiling.json)")
    path = "/root/repo/runs/protein_ae_sweep.json"
    rows = json.load(open(path)) if os.path.exists(path) else []
    rows.append(out)
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    subprocess.run(["git", "add", "runs/protein_ae_sweep.json"],
                   cwd="/root/repo")
    subprocess.run(["git", "commit", "-m",
                    f"protein AE horizon screen: ceiling at {steps} steps",
                    "--", "runs/protein_ae_sweep.json"],
                   cwd="/root/repo")
