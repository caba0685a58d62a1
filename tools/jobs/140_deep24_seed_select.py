"""Deep24 multi-seed headline selection + MC error bars (the 070 recipe,
deep24 family). Only runs once all three deep24 stepsweeps exist."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
runs = [r for r in ("community-small-pca-deep24",
                    "community-small-pca-deep24-s1",
                    "community-small-pca-deep24-s2")
        if os.path.exists(os.path.join("runs", r, "stepsweep.json"))]
assert len(runs) >= 2, f"need >=2 deep24 sweeps, have {runs}"
if len(runs) < 3:
    print(f"[12] WARNING: only {len(runs)} deep24 seeds swept this round — "
          "cross-seed pick is over those; queue the missing replicate next "
          "round before promoting.", flush=True)
from scripts.seed_select import main as seed_select

seed_select(runs + ["out=runs/seed_select_deep24.json"])
with open("runs/seed_select_deep24.json") as f:
    pick = json.load(f)["selected"]
from scripts.eval_ci import main as eval_ci

eval_ci([
    pick["run"],
    "seeds=5",
    "num_samples=256",
    f"step={pick['step']}",
    f"variant={pick.get('variant', 'raw')}",
    f"temperature={pick['temp']}",
    f"threshold={pick['threshold']}",
    f"connect_isolated={int(pick.get('connect_isolated', False))}",
    f"edge_sample={int(pick.get('edge_sample', False))}",
    f"connect_components={int(pick.get('connect_components', False))}",
])

import subprocess

winner = pick["run"]
subprocess.run(["git", "-C", "/root/repo", "add", "-f",
                "runs/seed_select_deep24.json",
                f"runs/{winner}/eval_ci.json"], check=False)
subprocess.run(["git", "-C", "/root/repo", "commit", "-q", "-m",
                "deep24 seed_select pick + eval_ci error bars",
                "--", "runs/seed_select_deep24.json",
                f"runs/{winner}/eval_ci.json"], check=False)
