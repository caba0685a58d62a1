"""pca seed replicate 1 — SHARED AE from the seed-0 run (isolates stage-2
flow seed luck; CLAUDE.md round 5: seed variance is flow luck, not AE)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small",
    "name=community-small-pca-s1",
    "ae_from=community-small-pca",
    "ae.canonicalize=pca",
    "train.seed=1",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "resume=1",
])
