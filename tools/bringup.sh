#!/bin/bash
# Fresh-box bringup: start the TPU worker and restore the standing job
# queue from the checked-in templates (tools/jobs/). Safe to re-run: the
# worker is only started if no PID-file process is alive, and jobs already
# queued or finished (done/*.ok) are not re-copied. Training jobs all pass
# resume=1, so re-queued unfinished runs continue from their checkpoints.
set -euo pipefail
cd "$(dirname "$0")/.."

QUEUE=/tmp/tpu_jobs
mkdir -p "$QUEUE/done"

if [ -f /tmp/tpu_worker.pid ] && kill -0 "$(cat /tmp/tpu_worker.pid)" 2>/dev/null; then
    echo "worker already running (pid $(cat /tmp/tpu_worker.pid))"
else
    nohup python -u tools/tpu_worker.py > /tmp/tpu_worker.log 2>&1 &
    echo $! > /tmp/tpu_worker.pid
    echo "worker started (pid $!)  log: /tmp/tpu_worker.log"
fi

for job in tools/jobs/[0-9]*.py; do
    base=$(basename "$job")
    # only a done/*.ok marker means finished — .fail (including STOP-
    # sentinel exits) must re-queue and resume. tools/jobs/done/ holds
    # COMMITTED markers (written when a job's artifacts are committed),
    # so finished work survives reimages and is never re-run.
    if [ -e "$QUEUE/$base" ] || [ -e "$QUEUE/done/$base.ok" ] \
        || [ -e "tools/jobs/done/$base.ok" ]; then
        continue
    fi
    cp "$job" "$QUEUE/$base"
    echo "queued $base"
done
