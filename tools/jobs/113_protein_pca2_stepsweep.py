"""Stepsweep the stabilized protein-pca2 run (round-10 protocol; big-N
screening reduction keeps the host-orbit cost bounded)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["protein-pca2", "every=4"])
