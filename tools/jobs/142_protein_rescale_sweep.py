"""Re-sweep protein-pca2@60k under the decode_scale protocol extension.

Motivation (measured, runs/protein-pca2/latent_probe.json): the flow's
generated clouds match the real MEAN pair distance at T≈1.0, but decode
density is 8× too sparse there — and at decoder_c=100 the probability
threshold moves the decode radius by <1%, so nothing in the old grid
could calibrate density at the geometry-correct temperature. The sweep
now bisects decode_scale per (step, T) to match the train split's mean
edge count and offers (1.0, s*) as decode candidates.

Supersedes the 60k stepsweep.json (same protocol + the new licensed
candidates; history keeps the old file). Runs after a worker restart
(module cache must carry gnfx/sample.py decode_scale).
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["protein-pca2", "every=4"])
