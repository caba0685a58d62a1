"""Persistent TPU job worker.

One long-lived process owns the TPU chip (first op after another process
used it can block minutes — CLAUDE.md). Jobs are .py files dropped into
/tmp/tpu_jobs; they run one at a time, oldest first, exec'd in this
process with a fresh globals dict (modules stay cached, so jit caches
persist across jobs). Finished jobs move to /tmp/tpu_jobs/done with a
.ok/.fail suffix; their stdout goes to this process's stdout.
"""
import os
import sys
import time
import traceback

QUEUE = "/tmp/tpu_jobs"
DONE = "/tmp/tpu_jobs/done"
os.makedirs(DONE, exist_ok=True)
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

print("[worker] warming TPU backend...", flush=True)
t0 = time.time()
import jax  # noqa: E402
print(f"[worker] backend={jax.default_backend()} devices={jax.devices()} "
      f"({time.time()-t0:.1f}s)", flush=True)

while True:
    jobs = sorted(f for f in os.listdir(QUEUE) if f.endswith(".py"))
    if not jobs:
        time.sleep(5)
        continue
    job = jobs[0]
    path = os.path.join(QUEUE, job)
    print(f"\n[worker] ==== running {job} ====", flush=True)
    t0 = time.time()
    status = "ok"
    try:
        with open(path) as f:
            src = f.read()
        exec(compile(src, path, "exec"), {"__name__": "__tpu_job__"})
    except SystemExit as e:
        if e.code not in (0, None):
            status = "fail"
    except BaseException:
        traceback.print_exc()
        status = "fail"
    print(f"[worker] ==== {job} {status} in {time.time()-t0:.1f}s ====",
          flush=True)
    os.rename(path, os.path.join(DONE, f"{job}.{status}"))

# Restart-in-place pattern: drop a job that renames itself into done/ and
# then os.execv's this script — fresh module cache, same TPU-owning process.
