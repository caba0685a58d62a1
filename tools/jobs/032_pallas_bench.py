"""Keep-or-retire measurement for the fused Pallas coupling kernel at the
one shape it could matter (protein scale, N=512) plus the community shape,
on the real TPU — see scripts/bench_pallas.py."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.bench_pallas import main

main(["N=512", "B=8", "iters=20"])
main(["N=128", "B=32", "iters=50"])
main(["N=20", "B=64", "iters=50"])
