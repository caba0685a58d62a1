#!/bin/bash
# Commit a run's durable artifacts into git. ONLY committed files survive
# reimages (runs/ was wiped in rounds 6 AND 7, costing a full retrain each
# time). runs/ is gitignored, so artifacts are force-added selectively:
# configs + result/selection JSONs + metrics log + the stage-1 AE params +
# final params + the latest flow checkpoint (enough to resume or re-eval).
#
# Usage: tools/commit_artifacts.sh <run-name> [<run-name> ...]
set -euo pipefail
cd "$(dirname "$0")/.."

for run in "$@"; do
    d="runs/$run"
    [ -d "$d" ] || { echo "no $d — skipped"; continue; }
    for f in config.json results.json stepsweep.json eval_ci.json metrics.jsonl; do
        [ -e "$d/$f" ] && git add -f "$d/$f"
    done
    [ -d "$d/params" ] && git add -f "$d/params"
    [ -d "$d/params_ae" ] && git add -f "$d/params_ae"
    if [ -d "$d/ckpt" ]; then
        latest=$(ls "$d/ckpt" | grep -E '^ckpt_[0-9]+\.npz$' | sort | tail -1 || true)
        [ -n "$latest" ] && git add -f "$d/ckpt/$latest"
    fi
done
[ -e runs/seed_select.json ] && git add -f runs/seed_select.json
git status --short | head -30
echo "staged — commit with an appropriate message"
