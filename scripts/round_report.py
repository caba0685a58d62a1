"""Aggregate run artifacts into the round's results table.

Usage:
    python scripts/round_report.py [runs-dir]

Pure CPU, no model evaluation: walks `runs/*/`, and for each run prints
its train-split-selected stepsweep pick (preferring the refined score,
like seed_select), the eval_ci mean +/- sd when present, and the final-
step FINAL row from metrics.jsonl as a fallback. Ends with the
cross-seed seed_select pick if runs/seed_select.json exists.

Output is a markdown table ready to paste into BASELINE.md.
"""

import json
import os
import sys


def _score(r):
    return r.get("train_score_refined", r["train_score"])


def _fmt(v):
    return f"{v:.3f}" if isinstance(v, (int, float)) else "—"


def _mmd3(d):
    return (f"{_fmt(d.get('mmd_degree'))}/{_fmt(d.get('mmd_clustering'))}/"
            f"{_fmt(d.get('mmd_orbit'))}")


def report(runs_dir="runs"):
    lines = ["| run | selected step | decode | test MMD deg/clus/orbit "
             "(train-selected) | eval_ci (mean ± sd) |",
             "|---|---|---|---|---|"]
    for run in sorted(os.listdir(runs_dir)):
        rd = os.path.join(runs_dir, run)
        if not os.path.isdir(rd):
            continue
        row = {"run": run, "step": None, "decode": "—", "mmd": "—",
               "ci": "—"}
        sw = os.path.join(rd, "stepsweep.json")
        if os.path.exists(sw):
            with open(sw) as f:
                rows = json.load(f)
            if rows:
                # Same pool rule as stepsweep BEST / seed_select: refined
                # (orbit-inclusive) scores are not comparable with big-N
                # orbit-free screening scores, so when any refined rows
                # exist they ARE the ranking pool; likewise pre-protocol
                # rows (no connectivity penalty) never compete with
                # penalty-inflated scores.
                refined = [r for r in rows if "train_score_refined" in r]
                pool = (refined
                        or [r for r in rows if "train_conn_penalty" in r]
                        or rows)
                best = min(pool, key=_score)
                row["step"] = best["step"]
                scale = best.get("decode_scale", 1.0)
                row["decode"] = (
                    f"{best.get('variant', 'raw')} T={best['temp']} "
                    f"thr={best['threshold']}"
                    f"{' es' if best.get('edge_sample') else ''}"
                    f"{' ci' if best.get('connect_isolated') else ''}"
                    f"{' cc' if best.get('connect_components') else ''}"
                    f"{' bt' if best.get('break_triangles') else ''}"
                    f"{f' ds={scale}' if scale != 1.0 else ''}")
                row["mmd"] = _mmd3(best)
        else:
            mj = os.path.join(rd, "metrics.jsonl")
            if os.path.exists(mj):
                final = None
                with open(mj) as f:
                    for line in f:
                        r = json.loads(line)
                        if r.get("stage") == "final":
                            final = r
                if final:
                    row["step"] = f"{final['step']} (final — no sweep)"
                    row["decode"] = (
                        f"T={final.get('sample_temperature')} "
                        f"thr={final.get('sample_threshold')}"
                        f"{' es' if final.get('sample_edge_sample') else ''}"
                        f"{' ci' if final.get('sample_connect_isolated') else ''}"
                        f"{' cc' if final.get('sample_connect_components') else ''}")
                    row["mmd"] = _mmd3(final)
        ci = os.path.join(rd, "eval_ci.json")
        if os.path.exists(ci):
            with open(ci) as f:
                c = json.load(f)
            parts = []
            for k in ("mmd_degree", "mmd_clustering", "mmd_orbit"):
                m, s = c.get(k), c.get(k + "_sd")
                if m is not None:
                    parts.append(f"{m:.3f}±{s:.3f}" if s is not None
                                 else f"{m:.3f}")
            if parts:
                row["ci"] = " / ".join(parts)
        if row["step"] is not None or row["ci"] != "—":
            lines.append(f"| {row['run']} | {row['step']} | {row['decode']} "
                         f"| {row['mmd']} | {row['ci']} |")
    for fn in sorted(os.listdir(runs_dir)):
        if not (fn.startswith("seed_select") and fn.endswith(".json")):
            continue
        with open(os.path.join(runs_dir, fn)) as f:
            s = json.load(f)
        b = s["selected"]
        lines.append("")
        lines.append(
            f"{fn[:-5]} pick: **{b['run']}@{b['step']}** "
            f"(train {_score(b):.3f}) -> test {_mmd3(b)}; spread across "
            f"{s['num_runs']} runs: {s['train_score_spread']:.3f}")
    return "\n".join(lines)


def main(argv):
    """Job-queue entry point (tools/jobs/999_round_report.py imports this)."""
    out = report(argv[0] if argv else "runs")
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
