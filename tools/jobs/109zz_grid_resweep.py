"""Re-sweep grid-pca under the extended selection grid: break_triangles
repair rows (offered because real grids are triangle-free) + threshold 0.8.
First probe on the committed 400k params: clustering MMD 1.06 -> 0.000
(degree 0.252, orbit 0.019) at the untuned default point — the sweep picks
the tuned combination. Overwrites runs/grid-pca/stepsweep.json (protocol
extension, recorded in BASELINE.md)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.stepsweep import main

main(["grid-pca", "every=2"])
