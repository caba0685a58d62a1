"""Optional tail: 24-coupling deep stack on the pca recipe (the round-4
diagnosed capacity lever). The round-5 deep run DIVERGED at the standard
schedule from attention-logit growth at depth; flow.st_input_norm=True cuts
that loop at its root (round-6 note: prefer it over the lr-limp), so the
standard lr/warmup stays. Shared seed-0 AE via ae_from."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small",
    "name=community-small-pca-deep24",
    "ae_from=community-small-pca",
    "ae.canonicalize=pca",
    "flow.num_couplings=24",
    "flow.st_input_norm=True",
    "train.num_steps=400000",
    "train.steps_per_call=256",
    "train.git_commit_s=900",
    "resume=1",
])
