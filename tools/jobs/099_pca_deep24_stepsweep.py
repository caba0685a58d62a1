"""Stepsweep the deep-24 pca run (optional tail)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-deep24", "every=2"])
