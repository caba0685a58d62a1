"""Grid clustering-defect lever retrain (round-3 verdict item 4, step 2):
the triangle probe attributed the defect DECODE-side (AE roundtrip of real
grids: 5 triangles/graph, clustering 0.39 vs real 0.0), so the lever is
stage-1. Picks the best override set from the committed CPU screen
(runs/grid_ae_screen_cpu.json, lowest deg+clus+orb ceiling) and retrains
the full grid pipeline with it."""
import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

rows = json.load(open("/root/repo/runs/grid_ae_screen_cpu.json"))
best = min(rows, key=lambda r: r["deg"] + r["clus"] + r["orb"])
print(f"[122] grid AE screen winner: {best['overrides']} "
      f"(deg {best['deg']} clus {best['clus']} orb {best['orb']})",
      flush=True)

main([
    "grid-pca",
    "name=grid-lever",
    *best["overrides"],
    "train.git_commit_s=900",
    "resume=1",
])
