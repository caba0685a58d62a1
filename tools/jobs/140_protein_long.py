"""SUPERSEDED 2026-08-20 (round 5, final round) by tools/jobs/152_protein_ext.py:
the 400k horizon was round-spanning by design and there is no next round;
152 sizes the horizon to the remaining wall clock (cap 160k) and skips the
1.5 h final-eval tail in favour of the targeted as_main stepsweep (153).

protein-pca2 horizon extension: 60k -> 400k steps (round-4 verdict #1).

The 60k run landed but is far underfit: generated graphs carry 10-20k
edges vs the real ~975 (the flow underestimates embedding-cloud spread),
best train-split MMD sum ~2.4 vs the AE ceiling ~1.04+orbit
(runs/protein-pca/ae_ceiling.json). Community quality needed 400k steps;
protein got 60k. This resumes the committed 60k checkpoint under a fresh
400k warmup-cosine schedule (a warm restart: the 60k schedule had fully
decayed; st_input_norm + warmup 2000 hold stability at N=512 bf16).

Round-spanning by design: ~23 steps/s -> ~4.1 h of training; in-job
commits every 900 s mean a reimage or round end costs <=15 min. The
next-round stepsweep (141) quotes whatever horizon this reaches.
"""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "protein-pca",
    "name=protein-pca2",
    "ae_from=protein-pca",
    "ae.decoder_c=100.0",
    "flow.st_input_norm=True",
    "train.lr_warmup=2000",
    "train.num_steps=400000",
    "train.git_commit_s=900",
    "resume=1",
])
