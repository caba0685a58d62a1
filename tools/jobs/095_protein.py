"""protein (DD-substitute geometric graphs, n in [100, 500]) at the preset
config: bfloat16 compute, batch 8, short horizon — a big-graph scaling
smoke more than a quality row (the offline generator is a SUBSTITUTION for
the real DD set; MMD numbers are not comparable to the paper's)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "protein",
    "name=protein-v1",
    "resume=1",
])
