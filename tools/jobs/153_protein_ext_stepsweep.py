"""Targeted sweep of the extended protein-pca2 horizon (verdict #1).

Sweeps the LAST checkpoint (+ one ~48k-steps-earlier mid-horizon point
when the clock allows) under the decode_scale protocol, and MERGES the
rows into stepsweep.json (as_main=1) so they compete with the 60k-horizon
rows from job 07 on the refined train-split score — the BEST across the
whole run is the quotable protein row, persisted into results.json.

Each big-N row is ~25-35 min (decode_scale bisection per T + 96-sample
x3-seed refine at N=512); the RSS guard requeues with progress committed
if the host leak bites.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from gnfx.train.checkpoint import _ckpt_steps

steps = _ckpt_steps("runs/protein-pca2/ckpt")
sel = {steps[-1]}
if time.time() < 1787253600 and len(steps) > 1:  # 19:20 UTC: afford row 2
    target = steps[-1] - 48000
    sel.add(min(steps, key=lambda s: abs(s - target)))
print(f"[153] sweeping steps {sorted(sel)} of {len(steps)} ckpts",
      flush=True)
from scripts.stepsweep import main

main(["protein-pca2", "steps=" + ",".join(str(s) for s in sorted(sel)),
      "as_main=1"])
