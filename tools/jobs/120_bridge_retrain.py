"""Flow retrain on the bridge-aware (tri bw=2) AE — round-3 verdict item 6.
Screened (runs/bridge_final_screen_cpu.json): tri bw=2 at 20k steps lowers
the CLUSTERING ceiling (0.090 vs 0.107 — the headline's at-ceiling
dimension) and lifts roundtrip connectivity 47->62%, at degree/orbit
ceiling cost; under the connectivity-aware selection score it beats the
baseline AE (0.59 vs 0.70). Own AE (bridge training changes stage 1)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small-pca",
    "name=community-small-tri2",
    "ae.bridge_mode=tri",
    "ae.bridge_weight=2.0",
    "train.git_commit_s=900",
    "resume=1",
])
