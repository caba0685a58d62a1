"""Re-sweep protein-pca2 after the 400k horizon extension (140).

Replaces the 60k-horizon stepsweep.json. The 400k run keeps ~100
checkpoints (ckpt_every=4000, keep=100): every=16 bounds the sweep at
~7 step rows; the big-N screening mode (orbit-free screen, finer T grid,
96-sample refine) keeps each row ~10-15 min instead of ~35.
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["protein-pca2", "every=16"])
