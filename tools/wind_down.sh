#!/bin/bash
# Round-end wind-down: release the TPU chip for the driver's bench.py.
#
# 1. Park every queued job file (including the in-flight one: removing it
#    from the queue makes the worker skip the done/ rename, so the job is
#    re-queued — not skipped as finished — by the next bringup).
# 2. Touch the STOP sentinel: a running train loop checkpoints and exits
#    at its next chunk boundary (seconds).
# 3. Wait for the worker to go idle, then kill it by exact PID.
# 4. Return parked jobs to the queue for the next round's bringup.
#
# Usage: tools/wind_down.sh [wait-seconds (default 180)]
set -uo pipefail
QUEUE=/tmp/tpu_jobs
WAIT=${1:-180}

mkdir -p "$QUEUE/parked"
shopt -s nullglob
for f in "$QUEUE"/[0-9]*.py; do mv "$f" "$QUEUE/parked/"; done
touch "$QUEUE/STOP"

pid=$(cat /tmp/tpu_worker.pid 2>/dev/null || true)
if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    # idle = the worker's queue scan finds nothing and it sleeps; detect by
    # watching the job-in-flight: once the parked job's exec returns, the
    # worker prints nothing new and its CPU goes quiet. Simplest robust
    # signal: poll until the log stops ending mid-job or timeout.
    for _ in $(seq "$WAIT"); do
        state=$(ps -o state= -p "$pid" 2>/dev/null || echo X)
        lastline=$(tail -1 /tmp/tpu_worker.log 2>/dev/null)
        if echo "$lastline" | grep -q "STOP sentinel\|==== .* in .*s ===="; then
            break
        fi
        sleep 1
    done
    kill "$pid" 2>/dev/null
    for _ in $(seq 30); do kill -0 "$pid" 2>/dev/null || break; sleep 1; done
    kill -0 "$pid" 2>/dev/null && kill -9 "$pid" 2>/dev/null
    echo "worker $pid stopped"
else
    echo "no live worker"
fi

rm -f "$QUEUE/STOP"
for f in "$QUEUE"/parked/[0-9]*.py; do mv "$f" "$QUEUE/"; done
rmdir "$QUEUE/parked" 2>/dev/null || true
echo "queue restored for next bringup: $(ls "$QUEUE" | grep -c '\.py$' || true) jobs"
