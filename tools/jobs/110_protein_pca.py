"""protein-pca: the real protein quality run (round-3 verdict item 2).
Picks decoder_c / bridge_weight from the committed quick-ceiling sweep
(runs/protein_ae_sweep.json, lowest deg+clus ceiling; connectivity gap
breaks ties), then trains the full pipeline. resume=1: spans rounds."""
import json
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

rows = json.load(open("/root/repo/runs/protein_ae_sweep.json"))


def score(r):
    conn_gap = max(0.0, r["true_frac_connected"] - r["frac_connected"])
    return r["deg"] + r["clus"] + conn_gap


best = min(rows, key=score)
print(f"[110] AE sweep winner: decoder_c={best['decoder_c']} "
      f"bridge_weight={best['bridge_weight']} "
      f"(deg {best['deg']} clus {best['clus']} conn {best['frac_connected']})",
      flush=True)

main([
    "protein-pca",
    "name=protein-pca",
    f"ae.decoder_c={best['decoder_c']}",
    f"ae.bridge_weight={best['bridge_weight']}",
    "train.git_commit_s=900",
    "resume=1",
])
