"""Stepsweep ego-small-pca."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["ego-small-pca", "every=2"])  # every-2nd ckpt: halves sweep wall-time, keeps 40k-step coverage
