"""Protein AE quick-ceiling: c=100 config as its OWN job (the 4-config
single-job sweep was OOM-killed at 130 GB host RSS mid-config — per-config
jobs get the worker's between-job cache clear + RSS restart). Appends to
runs/protein_ae_sweep.json."""
import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.ae_ceiling import main

r = main(["protein-pca", "ae.decoder_c=100.0", "ae.train_steps=6000",
          "quick=1"])
path = "/root/repo/runs/protein_ae_sweep.json"
rows = json.load(open(path))
rows = [x for x in rows if x["decoder_c"] != 100.0] + [r]
json.dump(rows, open(path, "w"), indent=2)
print("[105c] appended; rows:", len(rows), flush=True)
