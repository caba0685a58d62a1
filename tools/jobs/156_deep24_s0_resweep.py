"""Regenerate deep24 seed-0's stepsweep.json (lost to the seventh reimage;
only the backfilled stepsweep_best survived in results.json) so the
deep24 seed_select runs over three real protocol sweeps. every=8 matches
the s2 budget (~8 min)."""
import sys
import time

sys.path.insert(0, "/root/repo")
if time.time() > 1787261100:  # 21:25 UTC: wind-down margin
    print("[58] SKIPPED: past wind-down margin", flush=True)
else:
    from scripts.stepsweep import main
    main(["community-small-pca-deep24", "every=8"])
