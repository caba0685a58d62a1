"""ego-small + pca canonicalization (round-6 "next lever": the ego preset
defaults to canonicalize=none; the distance decoder's rigid-nuisance
argument applies identically). Own AE, seed 0."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "ego-small",
    "name=ego-small-pca",
    "ae.canonicalize=pca",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "resume=1",
])
