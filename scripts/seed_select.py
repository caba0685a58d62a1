"""Select the headline checkpoint across seed replicates by TRAIN-split score.

Usage:
    python scripts/seed_select.py <run-name> [<run-name> ...]

community-small shows large seed variance (CLAUDE.md round 5: identical
recipes at seeds 0/1 give train-split scores 0.66 vs 1.07), so an honest
headline needs selection over replicates — and the selection signal must
stay held-out. Each run's `stepsweep.json` rows already carry the
TRAIN-split score used for per-run (step, temperature, decode) selection;
this tool extends the same rule across runs: pick the row with the lowest
train_score over ALL replicates, quote its TEST-split MMD. A per-run table
and the cross-run spread (seed-variance evidence) are printed alongside.

No model evaluation happens here — purely an aggregation of stepsweep
artifacts, so it is CPU-trivial and rerunnable.
"""

import json
import os
import sys


def main(argv):
    runs = [a for a in argv if "=" not in a]
    out_path = os.path.join("runs", "seed_select.json")
    for a in argv:
        if a.startswith("out="):
            out_path = a.split("=", 1)[1]
    if not runs:
        raise SystemExit(
            "usage: seed_select.py <run-name> [<run-name> ...] [out=path]")
    rows = []
    for run in runs:
        path = os.path.join("runs", run, "stepsweep.json")
        if not os.path.exists(path):
            print(f"[seed_select] {run}: no stepsweep.json — skipped",
                  flush=True)
            continue
        with open(path) as f:
            for r in json.load(f):
                rows.append({**r, "run": run})
    if not rows:
        raise SystemExit("no stepsweep rows found")
    # Scale guard (same rule as stepsweep BEST): rows swept before the
    # connectivity-aware protocol carry penalty-free scores and must not
    # compete on the raw fallback; rank only current-protocol rows when
    # any are present.
    pool = [r for r in rows if "train_score_refined" in r
            or "train_conn_penalty" in r]
    if pool and len(pool) < len(rows):
        print(f"[seed_select] dropped {len(rows) - len(pool)} pre-protocol "
              "rows (no connectivity penalty — score scale incomparable)",
              flush=True)
        rows = pool
    # Big-N sweeps carry orbit-FREE screening scores on non-refined rows —
    # systematically lower than refined orbit-inclusive scores, so a
    # screen-only row must not win the cross-seed pick when refined rows
    # exist (stepsweep BEST applies the same rule per run).
    refined = [r for r in rows if "train_score_refined" in r]
    if refined and len(refined) < len(rows):
        print(f"[seed_select] dropped {len(rows) - len(refined)} screen-only "
              "rows (refined rows present — orbit-free screen scores are "
              "not comparable)", flush=True)
        rows = refined

    def score(r):
        # prefer the refined (multi-seed, 4x-sample) train score when the
        # sweep produced one — the screening score overfits MC noise
        return r.get("train_score_refined", r["train_score"])

    per_run_best = {}
    for r in rows:
        b = per_run_best.get(r["run"])
        if b is None or score(r) < score(b):
            per_run_best[r["run"]] = r
    print("[seed_select] per-run best (train-split selected):", flush=True)
    for run, r in sorted(per_run_best.items()):
        print(f"  {run}: train {score(r):.3f} -> test "
              f"{r['mmd_degree']:.3f}/{r['mmd_clustering']:.3f}/"
              f"{r.get('mmd_orbit', float('nan')):.3f} @ step {r['step']} "
              f"({r.get('variant', 'raw')}, T={r['temp']}, "
              f"thr={r['threshold']}, es={r.get('edge_sample', False)}, "
              f"cc={r.get('connect_components', False)})",
              flush=True)

    best = min(rows, key=score)
    scores = sorted(score(r) for r in per_run_best.values())
    result = {
        "selected": best,
        "num_runs": len(per_run_best),
        "per_run_train_scores": {k: score(v)
                                 for k, v in sorted(per_run_best.items())},
        "train_score_spread": (scores[-1] - scores[0]) if len(scores) > 1 else 0.0,
    }
    out = out_path
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[seed_select] SELECTED {json.dumps(best)}", flush=True)
    print(f"[seed_select] wrote {out}", flush=True)
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
