"""Summarise a jax.profiler trace (trace-viewer JSON) into a small committed
artifact: device-only steps/s, op counts, and the top ops by device time.

Usage:
    python scripts/trace_summary.py <trace-dir> [steps=K] [out=path]

`trace-dir` is the directory passed to train.trace_chunks / trace_context
(the profile lives under plugins/profile/<timestamp>/*.trace.json.gz).
Answers the device-occupancy half of the MFU question without shipping the
~100 MB raw trace: the summary records how long the chunk module ran on
device, how many XLA ops executed, and where the time went.
"""

import glob
import gzip
import json
import os
import sys

import numpy as np


def summarize(trace_dir: str, steps: int | None = None) -> dict:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = paths[-1]
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
    tnames = {(e["pid"], e.get("tid")): e["args"].get("name") for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    out = {"trace": path, "steps_per_chunk": steps}
    ops = []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        row = tnames.get((e["pid"], e.get("tid")), "")
        if row == "Steps":
            dur_s = e.get("dur", 0) / 1e6
            out["device_module_s"] = round(dur_s, 6)
            if steps:
                out["device_only_steps_per_s"] = round(steps / dur_s, 2)
        elif row == "XLA Ops":
            ops.append(e)
    out["num_device_ops"] = len(ops)
    if steps:
        out["device_ops_per_step"] = round(len(ops) / steps, 1)
    by_name = {}
    for e in ops:
        # strip SSA indices so fused instances aggregate
        name = "".join(c for c in e.get("name", "") if not c.isdigit())
        by_name[name] = by_name.get(name, 0.0) + e.get("dur", 0)
    total = sum(by_name.values())
    out["device_busy_s"] = round(total / 1e6, 6)
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:15]
    out["top_ops_pct"] = [
        {"op": k[:80], "pct": round(100.0 * v / total, 2)} for k, v in top]
    return out


def main(argv):
    trace_dir = argv[0]
    steps, out_path = None, None
    for a in argv[1:]:
        if a.startswith("steps="):
            steps = int(a.split("=")[1])
        elif a.startswith("out="):
            out_path = a.split("=", 1)[1]
    s = summarize(trace_dir, steps)
    print("[trace]", json.dumps(s, indent=1), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(s, f, indent=2)
    return s


if __name__ == "__main__":
    main(sys.argv[1:])
