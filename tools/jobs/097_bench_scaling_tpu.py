"""Single-chip absolute row of the scaling harness on the real TPU
(graphs/s + train steps/s at the bench shapes); the 1..8-device efficiency
curve comes from the CPU-mesh run of the same harness (runs/scaling_cpu.json)
— this box has one chip."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.bench_scaling import main

main()
