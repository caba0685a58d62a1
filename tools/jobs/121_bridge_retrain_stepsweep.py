"""Stepsweep the bridge-aware retrain."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-tri2", "every=2"])
