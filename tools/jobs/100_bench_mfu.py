"""Honest headline bench on the real chip (round-3 verdict item 1):
distinct per-step batches, sustained windows, XLA-cost-analysis FLOPs,
MFU vs the v5e bf16 peak. Writes runs/bench_mfu.json so the number is
committed alongside the round's BENCH artifact."""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

out = bench.main()
with open("/root/repo/runs/bench_mfu.json", "w") as f:
    json.dump(out, f, indent=2)
