"""Opportunistic second protein sweep row (queue ran ahead of schedule).

The extended-horizon final (124000) improved the refined score 2.33 ->
2.056 vs the 60k sweep's best, i.e. longer training helped monotonically
at the horizon ends; the one untested hypothesis worth a 31-min row is
"peak slightly before final" (lr not fully annealed). Sweeps step 104004
and as_main-merges so the run BEST can only improve.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

if time.time() > 1787260500:  # 21:15 UTC: too late to land a 31-min row
    print("[55] SKIPPED: not enough wall clock before wind-down", flush=True)
else:
    from scripts.stepsweep import main

    main(["protein-pca2", "steps=104004", "as_main=1"])
