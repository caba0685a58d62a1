"""Round-6 winner rebuild: community-small + pca canonicalization, seed 0.

Own AE (seed 0), 400k flow steps, chunked dispatch. resume=1: a worker
kill/restart mid-run continues from the latest checkpoint (this job is
expected to span rounds).
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small",
    "name=community-small-pca",
    "ae.canonicalize=pca",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "resume=1",
])
