"""Worker restart-in-place: module cache is per-worker-start, and jobs
after this one import gnfx code changed since bringup (bridge_weight,
trace_chunks, -pca presets). Rename self into done/ (so the worker's
post-job rename sees the file gone and just continues), then execv a fresh
worker image — same PID keeps TPU chip ownership."""
import os
import sys

ME = "/tmp/tpu_jobs/101z_restart.py"
os.makedirs("/tmp/tpu_jobs/done", exist_ok=True)
os.rename(ME, "/tmp/tpu_jobs/done/101z_restart.py.ok")
print("[restart-job] execv fresh worker (same PID)", flush=True)
sys.stdout.flush()
os.execv(sys.executable,
         [sys.executable, "-u", "/root/repo/tools/tpu_worker.py"])
