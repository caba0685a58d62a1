"""Stepsweep the pca rebuild: train-split (step, temperature, decode)
selection over all retained checkpoints, refined top-5 re-score."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca"])
