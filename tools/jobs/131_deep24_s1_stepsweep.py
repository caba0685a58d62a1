"""Stepsweep deep24 replicate 1 (every=4: replicate rows exist for cross-seed
selection, not fine step resolution — seed 0 carries the every=2 sweep)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-deep24-s1", "every=4"])
