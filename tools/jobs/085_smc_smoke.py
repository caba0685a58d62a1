"""TPU smoke for the SMC log-likelihood estimator (round-1 verdict: it was
CI-only) — cross-checks smc_log_prob against IWAE on held-out graphs of the
committed seed-0 run and writes runs/community-small-pca/smc.json."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.smc_smoke import main

main(["community-small-pca", "graphs=4", "particles=256", "stages=8"])
