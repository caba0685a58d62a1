"""Worker restart-in-place (round 5): jobs after this one need the
session's code changes — stepsweep's RSS-guard/requeue/as_main,
seed_select + round_report refined-pool rules, train_gnf eval_final=0,
ae_ceiling resume — and the worker's module cache predates them.
Rename self into done/ then execv a fresh worker image (same PID keeps
TPU chip ownership). The fresh image also loads the worker's own new
EX_TEMPFAIL(75) requeue handling, which MUST be live before the first
new-code stepsweep runs (the old worker would mark a 75-exit as fail
and eat the job).

Live-queue copy name: 08z_restart.py (between deep24-s1 train and its
stepsweep)."""
import os
import sys

ME = "/tmp/tpu_jobs/08z_restart.py"
os.makedirs("/tmp/tpu_jobs/done", exist_ok=True)
os.rename(ME, "/tmp/tpu_jobs/done/08z_restart.py.ok")
print("[restart-job] execv fresh worker (same PID)", flush=True)
sys.stdout.flush()
os.execv(sys.executable,
         [sys.executable, "-u", "/root/repo/tools/tpu_worker.py"])
