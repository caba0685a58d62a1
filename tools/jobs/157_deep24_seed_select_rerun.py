"""Re-run deep24 seed_select over the full three-sweep family (after 58
restored seed-0's sweep). Re-runs eval_ci only if the pick changed from
community-small-pca-deep24-s2 @ 400000."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
runs = [r for r in ("community-small-pca-deep24",
                    "community-small-pca-deep24-s1",
                    "community-small-pca-deep24-s2")
        if os.path.exists(os.path.join("runs", r, "stepsweep.json"))]
from scripts.seed_select import main as seed_select

seed_select(runs + ["out=runs/seed_select_deep24.json"])
with open("runs/seed_select_deep24.json") as f:
    pick = json.load(f)["selected"]
if pick["run"] != "community-small-pca-deep24-s2" or pick["step"] != 400000:
    print(f"[59] pick CHANGED -> {pick['run']}@{pick['step']}; re-running eval_ci",
          flush=True)
    from scripts.eval_ci import main as eval_ci
    eval_ci([
        pick["run"], "seeds=5", "num_samples=256",
        f"step={pick['step']}", f"variant={pick.get('variant', 'raw')}",
        f"temperature={pick['temp']}", f"threshold={pick['threshold']}",
        f"connect_isolated={int(pick.get('connect_isolated', False))}",
        f"edge_sample={int(pick.get('edge_sample', False))}",
        f"connect_components={int(pick.get('connect_components', False))}",
        f"break_triangles={int(pick.get('break_triangles', False))}",
        f"decode_scale={pick.get('decode_scale', 1.0)}",
    ])
else:
    print("[59] pick unchanged (deep24-s2@400000); eval_ci already committed",
          flush=True)
import subprocess
subprocess.run(["git", "add", "-f", "runs/seed_select_deep24.json",
                "runs/community-small-pca-deep24/stepsweep.json",
                "runs/community-small-pca-deep24/results.json",
                f"runs/{pick['run']}/eval_ci.json"], cwd="/root/repo")
subprocess.run(["git", "commit", "-m",
                "deep24: seed-0 sweep regenerated; seed_select over full 3-seed family",
                ], cwd="/root/repo")
