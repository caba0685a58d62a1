"""Stepsweep deep24 replicate 2."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-deep24-s2", "every=4"])
