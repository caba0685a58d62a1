"""Stepsweep ego-small-pca."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["ego-small-pca"])
