"""Headline selection: train-split pick across the pca seed replicates,
then Monte-Carlo error bars (5 sampling seeds) on the winning row."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from scripts.seed_select import main as seed_select

runs = [r for r in ("community-small-pca", "community-small-pca-s1",
                    "community-small-pca-s2")
        if os.path.exists(os.path.join("runs", r, "stepsweep.json"))]
seed_select(runs)

with open("runs/seed_select.json") as f:
    pick = json.load(f)["selected"]
from scripts.eval_ci import main as eval_ci

eval_ci([pick["run"], "seeds=5", f"step={pick['step']}"])
