"""Re-sweep the seed-0 pca run under the round-2 protocol (connectivity-
aware selection score + connect_components repair in the decode grid).
Only the final 400k checkpoint survives on this box, so this is a one-step
sweep (~minutes); it replaces the round-1 stepsweep.json whose score did
not price in the 55%-connected defect, and makes the seed-0 row comparable
to the s1/s2 sweeps that follow."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["community-small-pca"])
