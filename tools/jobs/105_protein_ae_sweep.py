"""Protein AE quick-ceiling sweep (round-3 verdict item 2, step 1: measure
the ceiling BEFORE spending flow steps — the round-2 lesson). Short-horizon
(6k-step) AEs at embed 20 / pca over decoder_c and bridge_weight; quick=1
eval (1 draw, no orbit, 40 test graphs) because host orbit counting at
N=512 dominates wall clock. Writes runs/protein_ae_sweep.json; job 110
reads it to pick decoder_c/bridge_weight for the real run."""
import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.ae_ceiling import main

rows = []
for c, bw in ((10.0, 0.0), (50.0, 0.0), (100.0, 0.0), (50.0, 2.0)):
    r = main(["protein-pca", f"ae.decoder_c={c}", f"ae.bridge_weight={bw}",
              "ae.train_steps=6000", "quick=1"])
    rows.append(r)
with open("/root/repo/runs/protein_ae_sweep.json", "w") as f:
    json.dump(rows, f, indent=2)
print("[sweep] wrote runs/protein_ae_sweep.json", flush=True)
