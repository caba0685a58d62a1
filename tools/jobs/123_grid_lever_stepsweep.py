"""Stepsweep the grid lever retrain."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["grid-lever", "every=2"])
