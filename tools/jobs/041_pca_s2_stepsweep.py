"""Stepsweep the pca seed-2 replicate."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-s2", "every=2"])  # every-2nd ckpt: halves sweep wall-time, keeps 40k-step coverage
