"""pca seed replicate 2 — shared AE from the seed-0 run."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small",
    "name=community-small-pca-s2",
    "ae_from=community-small-pca",
    "ae.canonicalize=pca",
    "train.seed=2",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "resume=1",
])
