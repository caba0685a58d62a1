"""deep24 flow-seed replicate 1 (shared seed-0 AE): the single-seed deep24
beat 2 of 3 shallow seeds on the refined protocol (0.2719 vs 0.2901/0.2739,
s1 0.2617) — promotion to flagship needs its own multi-seed selection."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small-pca",
    "name=community-small-pca-deep24-s1",
    "ae_from=community-small-pca",
    "flow.num_couplings=24",
    "flow.st_input_norm=True",
    "train.seed=1",
    "train.git_commit_s=900",
    "resume=1",
])
