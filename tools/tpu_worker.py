"""Persistent TPU job worker.

One long-lived process owns the TPU chip (first op after another process
used it can block minutes — CLAUDE.md). Jobs are .py files dropped into
/tmp/tpu_jobs; they run one at a time, oldest first, exec'd in this
process with a fresh globals dict (modules stay cached, so jit caches
persist across jobs). Finished jobs move to /tmp/tpu_jobs/done with a
.ok/.fail suffix; their stdout goes to this process's stdout.

Memory hygiene: host RSS accumulates across jobs (jit executables,
per-job module state) — an unbounded worker was OOM-killed at 130 GB
mid-job. After every job the worker clears jax's compilation caches and
gc's; if RSS still exceeds RSS_RESTART_GB it re-execs itself BETWEEN
jobs (fresh process image, same PID => keeps chip ownership, queue state
stays consistent).
"""
import gc
import os
import sys
import time
import traceback

# Overridable so a scratch worker (tests, verification) can run against its
# own queue without stealing jobs from the production one.
QUEUE = os.environ.get("TPU_JOBS_DIR", "/tmp/tpu_jobs")
DONE = os.path.join(QUEUE, "done")
RSS_RESTART_GB = float(os.environ.get("TPU_WORKER_RSS_GB", "40.0"))
os.makedirs(DONE, exist_ok=True)
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

print("[worker] warming TPU backend...", flush=True)
t0 = time.time()
import jax  # noqa: E402
print(f"[worker] backend={jax.default_backend()} devices={jax.devices()} "
      f"({time.time()-t0:.1f}s)", flush=True)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1e6
    return 0.0


while True:
    jobs = sorted(f for f in os.listdir(QUEUE) if f.endswith(".py"))
    if not jobs:
        time.sleep(5)
        continue
    job = jobs[0]
    path = os.path.join(QUEUE, job)
    print(f"\n[worker] ==== running {job} ==== (rss {rss_gb():.1f} GB)",
          flush=True)
    t0 = time.time()
    status = "ok"
    try:
        with open(path) as f:
            src = f.read()
        exec(compile(src, path, "exec"), {"__name__": "__tpu_job__"})
    except SystemExit as e:
        if e.code == 75:
            # EX_TEMPFAIL: the job bounded its own RSS (scripts/stepsweep.py
            # RSS guard), saved restartable progress, and wants a fresh
            # process image. Leave it queued; it resumes after re-exec.
            print(f"[worker] ==== {job} requeued (EX_TEMPFAIL) in "
                  f"{time.time()-t0:.1f}s ==== re-exec for a fresh image",
                  flush=True)
            os.execv(sys.executable, [sys.executable, "-u", __file__])
        if e.code not in (0, None):
            status = "fail"
    except BaseException:
        traceback.print_exc()
        status = "fail"
    dt = time.time() - t0
    if not os.path.exists(path):
        # the job moved/renamed itself (restart-in-place pattern below)
        continue
    os.rename(path, os.path.join(DONE, f"{job}.{status}"))
    jax.clear_caches()
    gc.collect()
    rss = rss_gb()
    print(f"[worker] ==== {job} {status} in {dt:.1f}s ==== (rss {rss:.1f} GB)",
          flush=True)
    if rss > RSS_RESTART_GB:
        print(f"[worker] rss {rss:.1f} GB > {RSS_RESTART_GB} GB — re-exec "
              "for a fresh process image", flush=True)
        os.execv(sys.executable, [sys.executable, "-u", __file__])

# Restart-in-place pattern: drop a job that renames itself into done/ and
# then os.execv's this script — fresh module cache, same TPU-owning process.
