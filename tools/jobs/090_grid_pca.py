"""grid + pca canonicalization (round-6 optional tail). A 2-D lattice's
distance-decoder embedding is a rigid planar shape, so rigid-nuisance
removal should pay off even more than on community graphs. Own AE, seed 0.
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "grid",
    "name=grid-pca",
    "ae.canonicalize=pca",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "resume=1",
])
