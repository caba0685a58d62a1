"""Pytree checkpoints: flat npz + JSON meta, atomic write-then-rename.

TPU-native equivalent of the reference's `tf.train.Saver` (SURVEY.md §2.1 #12,
§5): saves params, optimizer state, step, and PRNG key so a restarted job
resumes exactly — the data stream is a pure function of (seed, step)
(`gnfx.data.batching.repeat_batches`), so no iterator state needs saving
beyond the step. Multi-host: only process 0 writes (all-reduce-identical
state), everyone restores.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import tempfile
import time
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_names(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        name = "/".join(str(p) for p in path)
        out[name] = np.asarray(leaf)
    return out


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state: Any,
    *,
    meta: dict | None = None,
    keep: int = 3,
) -> str:
    """Write `state` (any pytree) at `ckpt_dir/ckpt_<step>.npz` atomically."""
    if jax.process_index() != 0:
        return ""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = _flatten_with_names(jax.device_get(state))
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if meta is not None:
        meta_tmp = path + ".meta.tmp"
        with open(meta_tmp, "w") as f:
            json.dump({"step": step, **meta}, f, indent=2)
        os.replace(meta_tmp, path + ".meta.json")
    _prune(ckpt_dir, keep)
    return path


def _ckpt_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for fn in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)\.npz", fn)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def _prune(ckpt_dir: str, keep: int):
    steps = _ckpt_steps(ckpt_dir)
    for s in steps[:-keep]:
        for suffix in (".npz", ".npz.meta.json"):
            p = os.path.join(ckpt_dir, f"ckpt_{s:08d}") + suffix
            if os.path.exists(p):
                os.unlink(p)


def latest_step(ckpt_dir: str) -> int | None:
    steps = _ckpt_steps(ckpt_dir)
    return steps[-1] if steps else None


# --------------------------------------------------------------------------
# In-job artifact commits (failure recovery, SURVEY.md §5): this box gets
# reimaged without warning — only files committed to git survive. Committing
# run artifacts only at job END left a window hours wide on long runs (the
# round-3 deep24 result was lost to exactly that). This hook commits the
# latest checkpoint + metrics at checkpoint cadence DURING training, so a
# reimage costs at most one throttle interval of progress.
# --------------------------------------------------------------------------

_LAST_COMMIT_T: dict = {}


def _git_root(path: str) -> str | None:
    d = os.path.abspath(path)
    while True:
        if os.path.isdir(os.path.join(d, ".git")):
            return d
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def commit_run_artifacts(
    run_dir: str, step: int, *, min_interval_s: float = 900.0,
    force: bool = False, label: str = "in-job checkpoint",
) -> bool:
    """Git-commit a run's durable artifacts mid-job (throttled).

    Commits ONLY pathspecs under `run_dir` (config/metrics/results JSONs,
    params dirs, the latest ckpt in ckpt/ and ckpt_ae/ plus deletions of
    pruned ones), so concurrently staged unrelated work is never swept in.
    Failures (index.lock held by another process, no repo — e.g. tests in
    tmp dirs) are non-fatal: return False and retry at the next cadence.
    """
    if jax.process_index() != 0:
        return False
    key = os.path.abspath(run_dir)
    now = time.monotonic()
    if not force and now - _LAST_COMMIT_T.get(key, -1e18) < min_interval_s:
        return False
    repo = _git_root(run_dir)
    if repo is None:
        return False
    rel = os.path.relpath(key, repo)
    adds = []
    for f in ("config.json", "metrics.jsonl", "results.json",
              "stepsweep.json", "stepsweep_partial.json",
              "stepsweep.json.inflight", "stepsweep_partial.json.inflight",
              "eval_ci.json"):
        if os.path.exists(os.path.join(key, f)):
            adds.append(os.path.join(rel, f))
    for d in ("params", "params_ae"):
        if os.path.isdir(os.path.join(key, d)):
            adds.append(os.path.join(rel, d))
    for d in ("ckpt", "ckpt_ae"):
        steps = _ckpt_steps(os.path.join(key, d))
        if steps:
            base = os.path.join(rel, d, f"ckpt_{steps[-1]:08d}")
            adds.append(base + ".npz")
            if os.path.exists(os.path.join(repo, base + ".npz.meta.json")):
                adds.append(base + ".npz.meta.json")
    if not adds:
        return False

    def git(*args):
        return subprocess.run(["git", "-C", repo, *args],
                              capture_output=True, text=True)

    if git("add", "-f", "--", *adds).returncode != 0:
        return False  # likely index.lock contention — retry next cadence
    # stage deletions of pruned (tracked-but-removed) files; runs/ is
    # gitignored so this never adds new untracked content
    git("add", "-A", "--", rel)
    r = git("commit", "-q", "--no-verify",
            "-m", f"{os.path.basename(key)}: {label} @ step {step}",
            "--", rel)
    # "nothing to commit" also counts as up-to-date — don't re-try hot
    _LAST_COMMIT_T[key] = now
    return r.returncode == 0


def restore_checkpoint(ckpt_dir: str, state_template: Any, step: int | None = None) -> Tuple[Any, int]:
    """Restore into the structure of `state_template`. Returns (state, step)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    with np.load(path) as data:
        flat = dict(data)
    names = list(_flatten_with_names(state_template).keys())
    missing = [n for n in names if n not in flat]
    if missing:
        raise KeyError(f"checkpoint missing leaves: {missing[:5]} (+{len(missing)-5 if len(missing)>5 else 0} more)")
    leaves, treedef = jax.tree_util.tree_flatten(state_template)
    restored = [flat[n] for n in names]
    new_leaves = [
        np.asarray(r).astype(np.asarray(l).dtype).reshape(np.shape(l))
        for l, r in zip(leaves, restored)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step
