"""KILLED 2026-08-20 (round 5, final round) — removed from the live queue.
The round-4 deprioritization below already established this retrain can
at most close a flow-side gap on a dataset whose row of record (MMD sum
0.187, clustering 0.000 via break_triangles) is the best non-community
number in the repo; the final round's queue budget went to the two
higher-ranked verdict items (protein #1, deep24 #2). The AE screen
artifact (runs/grid_ae_screen_cpu.json) stays committed as the recorded
state of the lever.

Grid clustering-defect lever retrain (round-3 verdict item 4, step 2)
— DEPRIORITIZED on screen evidence (round 4): the resweep already landed
clustering 0.000 via break_triangles (BASELINE grid row, MMD sum 0.187),
leaving degree 0.176 as the only defect; the AE screen's own numbers say
the AE is NOT the binding constraint there (baseline ceiling deg 0.059 vs
0.063 at the best override) — so this retrain can at most close a
flow/selection-side gap. Runs after the protein horizon extension; a
measured null here still closes the verdict item.

Original rationale:
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
