"""Stepsweep deep24 replicate 2.

every=8 (not the every=4 used for seed0/s1): the final-round queue runs
this AFTER the protein extension sweep, and the coarser checkpoint grid
halves the ~1 h sweep so seed_select + eval_ci still fit before
wind-down. Per-row protocol is identical; s2's refined BEST just picks
over fewer candidate steps (slightly conservative for s2)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca-deep24-s2", "every=8"])
