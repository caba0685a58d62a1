"""Headline selection: train-split pick across the pca seed replicates,
then Monte-Carlo error bars (5 sampling seeds x 256 samples) on the winning
row AT ITS SELECTED decode (the pick's own temperature/threshold/repair —
not the run's results.json defaults)."""
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
