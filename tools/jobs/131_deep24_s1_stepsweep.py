"""Stepsweep deep24 replicate 1."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-deep24-s1", "every=2"])
