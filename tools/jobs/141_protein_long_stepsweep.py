"""Re-sweep protein-pca2 after the 400k horizon extension (140).

Replaces the 60k-horizon stepsweep.json; every=4 keeps the host-orbit
cost bounded at N=512 (big-N screening reduction applies).
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["protein-pca2", "every=4"])
