"""TPU job-worker queue semantics (tools/tpu_worker.py), driven as a real
subprocess against a scratch queue (TPU_JOBS_DIR) on the CPU backend.

Pinned behaviors:
- a job exiting EX_TEMPFAIL(75) stays QUEUED (the stepsweep RSS guard's
  requeue signal), the worker re-execs itself, and the rerun completes;
- ordinary success/failure moves jobs to done/ with .ok/.fail suffixes.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "tpu_worker.py")


@pytest.mark.slow
def test_requeue_then_complete_and_fail_marking(tmp_path):
    q = tmp_path / "q"
    q.mkdir()
    sentinel = q / ".tripped"
    (q / "01_requeue_probe.py").write_text(
        "import os\n"
        f"s = {str(sentinel)!r}\n"
        "if not os.path.exists(s):\n"
        "    open(s, 'w').write('1')\n"
        "    raise SystemExit(75)\n"
        "print('second pass ok', flush=True)\n"
    )
    (q / "02_failing.py").write_text("raise SystemExit(3)\n")
    env = dict(os.environ, TPU_JOBS_DIR=str(q), JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "-u", WORKER], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        done = q / "done"
        while time.time() < deadline:
            if (done / "01_requeue_probe.py.ok").exists() and \
                    (done / "02_failing.py.fail").exists():
                break
            time.sleep(1)
        else:
            pytest.fail("worker did not finish both jobs in 120 s")
    finally:
        proc.kill()
        out = proc.communicate(timeout=30)[0]
    assert "requeued (EX_TEMPFAIL)" in out, out
    assert "second pass ok" in out, out
    # the requeued job never got a .fail marker
    assert not (done / "01_requeue_probe.py.fail").exists()
