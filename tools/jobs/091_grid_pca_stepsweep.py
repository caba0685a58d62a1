"""Stepsweep the grid-pca run: train-split (step, temperature, decode)
selection over retained checkpoints, refined top-5 re-score."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["grid-pca", "every=2"])  # every-2nd ckpt: halves sweep wall-time, keeps 40k-step coverage
