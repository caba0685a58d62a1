"""Stepsweep the pca seed-2 replicate."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-s2"])
