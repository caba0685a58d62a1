"""DEPRIORITIZED 2026-08-20 (round 5, final round) — removed from the live
queue, recorded per the round-4 verdict's "run it or kill it" (#5).

Why killed rather than run: the remaining ~10 h of TPU queue covers the
two higher-ranked verdict items exactly — deep24 s1/s2 replicates +
seed_select (#2, ~4.2 h) and the protein horizon extension + targeted
sweep (#1, ~4 h) — and this retrain (~1.7 h train+sweep) does not fit
beside them. Its expected value is also the smallest of the three: the
screen's edge is selection-score 0.59 vs 0.70 on a 20k-step CPU AE
screen (hypothesis-level, single seed, in a family where flow-seed
variance alone spans 0.26–0.29 on the refined protocol), the community
headline it would improve already beats the recalled paper band at 100%
connectivity (0.084±0.010/0.121±0.010/0.054±0.009), and the
connect_components decode repair closed most of the connectivity gap the
bridge AE was aimed at (round-10 attribution: the repair re-adds exactly
the dropped bridges). The screen artifacts stay committed
(runs/bridge_screen_cpu.json, runs/bridge_tri_screen_cpu.json,
runs/bridge_final_screen_cpu.json) as the recorded state of the lever.

Original rationale (round-3 verdict item 6): tri bw=2 at 20k steps lowers
the CLUSTERING ceiling (0.090 vs 0.107 — the headline's at-ceiling
dimension) and lifts roundtrip connectivity 47->62%, at degree/orbit
ceiling cost; under the connectivity-aware selection score it beats the
baseline AE (0.59 vs 0.70). Own AE (bridge training changes stage 1)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "community-small-pca",
    "name=community-small-tri2",
    "ae.bridge_mode=tri",
    "ae.bridge_weight=2.0",
    "train.git_commit_s=900",
    "resume=1",
])
