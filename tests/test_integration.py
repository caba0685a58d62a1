"""End-to-end integration (SURVEY.md §4.5): a tiny two-stage run on
community-small must decrease NLL and produce non-degenerate samples, and
the post-hoc analysis tools (generate / stepsweep / eval_ci) must drive
that run's artifacts. CPU-runnable (BASELINE config 1)."""

import importlib
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def smoke_run(tmp_path_factory):
    """Train the smoke pipeline once; yield (run_cwd, results)."""
    cwd = tmp_path_factory.mktemp("smoke_e2e")
    old = os.getcwd()
    os.chdir(cwd)
    try:
        train_gnf = importlib.import_module("train_gnf")
        results = train_gnf.main(
            ["smoke", "train.num_steps=150", "ae.train_steps=150"])
    finally:
        os.chdir(old)
    return cwd, results


@pytest.mark.slow
def test_smoke_pipeline(smoke_run, monkeypatch):
    cwd, results = smoke_run
    monkeypatch.chdir(cwd)
    # sanity: structurally non-degenerate samples
    assert results["gen_mean_nodes"] > 5
    assert results["gen_mean_edges"] > 1
    assert np.isfinite(results["mmd_degree"])
    assert np.isfinite(results["mmd_clustering"])
    assert np.isfinite(results["mmd_orbit"])
    assert results["graphs_per_s"] > 0

    # NLL must decrease over stage-2 training
    nlls = []
    with open(os.path.join("runs", "smoke", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == "flow":
                nlls.append(rec["nll_per_dim"])
    assert len(nlls) >= 3
    assert nlls[-1] < nlls[0], nlls

    # artifacts exist
    assert os.path.exists(os.path.join("runs", "smoke", "results.json"))
    assert os.path.exists(os.path.join("runs", "smoke", "config.json"))


@pytest.mark.slow
def test_generate_tool(smoke_run, monkeypatch):
    cwd, _ = smoke_run
    monkeypatch.chdir(cwd)
    from scripts import generate
    res = generate.main(["smoke", "num_samples=16", "temperature=0.9"])
    assert res["num_samples"] == 16
    assert np.isfinite(res["mmd_degree"])
    # mid-run checkpoint restore path (checkpoints land on chunk boundaries)
    from gnfx.train.checkpoint import _ckpt_steps
    mid = _ckpt_steps(os.path.join("runs", "smoke", "ckpt"))[0]
    res_mid = generate.main(["smoke", "num_samples=8", f"step={mid}"])
    assert np.isfinite(res_mid["mmd_degree"])


@pytest.mark.slow
def test_stepsweep_tool(smoke_run, monkeypatch):
    cwd, _ = smoke_run
    monkeypatch.chdir(cwd)
    from scripts import stepsweep
    # shrink the selection grid: the test pins the plumbing, not the search
    monkeypatch.setattr(stepsweep, "TEMPS", (1.0,))
    monkeypatch.setattr(stepsweep, "DECODES", ((0.5, False),))
    best = stepsweep.main(["smoke", "num_samples=16"])
    assert np.isfinite(best["mmd_degree"])
    assert best["train_score"] > 0
    swept = json.load(open(os.path.join("runs", "smoke", "stepsweep.json")))
    assert len(swept) >= 1
    # BEST selects on the train split, not test MMDs
    assert best["train_score"] == min(r["train_score"] for r in swept)


@pytest.mark.slow
def test_stepsweep_rss_guard_and_resume(smoke_run, monkeypatch):
    """The in-sweep RSS bound must exit EX_TEMPFAIL with progress saved to
    the .inflight file, and the rerun must skip the already-swept steps,
    finish, remove the inflight file, and persist BEST into results.json
    (the worker requeues a 75-exit and re-execs for a fresh image)."""
    cwd, _ = smoke_run
    monkeypatch.chdir(cwd)
    from scripts import stepsweep
    monkeypatch.setattr(stepsweep, "TEMPS", (1.0,))
    monkeypatch.setattr(stepsweep, "DECODES", ((0.5, False),))
    monkeypatch.setattr(stepsweep, "RSS_EXIT_GB", 1e-4)  # trip immediately
    with pytest.raises(SystemExit) as e:
        stepsweep.main(["smoke", "num_samples=16"])
    assert e.value.code == stepsweep.REQUEUE_EXIT_CODE
    inflight = os.path.join("runs", "smoke", "stepsweep.json.inflight")
    assert os.path.exists(inflight)
    done_rows = json.load(open(inflight))
    assert len(done_rows) >= 1
    monkeypatch.setattr(stepsweep, "RSS_EXIT_GB", 1e9)
    best = stepsweep.main(["smoke", "num_samples=16"])
    assert not os.path.exists(inflight)
    swept = json.load(open(os.path.join("runs", "smoke", "stepsweep.json")))
    # resumed rows were kept (not re-swept) and the sweep completed them all
    assert {r["step"] for r in swept} >= {r["step"] for r in done_rows}
    from gnfx.train.checkpoint import _ckpt_steps
    assert {r["step"] for r in swept} == set(
        _ckpt_steps(os.path.join("runs", "smoke", "ckpt")))
    res = json.load(open(os.path.join("runs", "smoke", "results.json")))
    assert res["results"]["stepsweep_best"]["step"] == best["step"]


@pytest.mark.slow
def test_stepsweep_as_main_merge(smoke_run, monkeypatch):
    """A targeted steps= sweep with as_main=1 merges into stepsweep.json:
    prior rows at other steps stay in the ranking, same-step rows are
    replaced, and BEST is persisted (a horizon extension's rows must
    compete with the earlier sweep instead of hiding in a partial file)."""
    cwd, _ = smoke_run
    monkeypatch.chdir(cwd)
    from gnfx.train.checkpoint import _ckpt_steps
    from scripts import stepsweep
    monkeypatch.setattr(stepsweep, "TEMPS", (1.0,))
    monkeypatch.setattr(stepsweep, "DECODES", ((0.5, False),))
    sw_path = os.path.join("runs", "smoke", "stepsweep.json")
    prior = [{"step": -1, "variant": "raw", "temp": 0.9, "threshold": 0.5,
              "train_score": 99.0, "train_mmd_sum": 99.0,
              "train_conn_penalty": 0.0, "train_score_refined": 98.0,
              "mmd_degree": 9, "mmd_clustering": 9, "mmd_orbit": 9}]
    with open(sw_path, "w") as f:
        json.dump(prior, f)
    last = _ckpt_steps(os.path.join("runs", "smoke", "ckpt"))[-1]
    best = stepsweep.main(["smoke", "num_samples=16",
                           f"steps={last}", "as_main=1"])
    swept = json.load(open(sw_path))
    assert {r["step"] for r in swept} == {-1, last}
    assert best["step"] == last  # refined real row beats the fake prior
    assert not os.path.exists(sw_path + ".inflight")


@pytest.mark.slow
def test_eval_ci_tool(smoke_run, monkeypatch):
    cwd, _ = smoke_run
    monkeypatch.chdir(cwd)
    from scripts import eval_ci
    out = eval_ci.main(["smoke", "seeds=2", "num_samples=16"])
    assert out["seeds"] == 2
    assert np.isfinite(out["mmd_degree"]) and out["mmd_degree_sd"] >= 0
    assert os.path.exists(os.path.join("runs", "smoke", "eval_ci.json"))


def test_calibrated_scale_covers_both_directions():
    """Density calibration must find matching scales on BOTH sides of 1.0:
    protein decodes ~8x too sparse at T=1.0 (scale > 1) but 20x too dense
    at T=0.6 (scale << 0.7 — the original [0.7, 3.0] range clamped at its
    lower bound and returned rows 13x too dense)."""
    from scripts.stepsweep import calibrated_scale
    # synthetic monotone density: edges = base * scale^3
    for base, real, side in ((120.0, 975.0, "sparse"),
                             (20000.0, 975.0, "dense")):
        s = calibrated_scale(lambda sc, b=base: b * sc ** 3, real)
        got = base * s ** 3
        assert abs(got - real) / real < 0.15, (side, s, got)
        if side == "sparse":
            assert s > 1.0
        else:
            assert s < 0.5


def test_seed_select_prefers_refined(tmp_path, monkeypatch):
    """seed_select must rank on train_score_refined when present: the
    screening score's cross-row min overfits MC noise (a fluky row with
    screening 0.54 but refined 1.07 once beat the real optimum)."""
    monkeypatch.chdir(tmp_path)
    rows_a = [  # fluky screening winner, poor refined score
        {"step": 100, "variant": "raw", "temp": 0.9, "threshold": 0.5,
         "connect_isolated": False, "edge_sample": False,
         "train_score": 0.5, "train_score_refined": 1.1,
         "mmd_degree": 0.4, "mmd_clustering": 0.4, "mmd_orbit": 0.4},
        {"step": 200, "variant": "ema", "temp": 0.8, "threshold": 0.3,
         "connect_isolated": False, "edge_sample": False,
         "train_score": 0.7, "train_score_refined": 0.75,
         "mmd_degree": 0.2, "mmd_clustering": 0.2, "mmd_orbit": 0.1}]
    rows_b = [  # legacy sweep: no refined score, no connectivity penalty —
        # its screening score is on the penalty-free scale and must NOT
        # compete with current-protocol rows (scale guard)
        {"step": 300, "temp": 1.0, "threshold": 0.5,
         "train_score": 0.3,
         "mmd_degree": 0.3, "mmd_clustering": 0.3, "mmd_orbit": 0.3}]
    for name, rows in (("run-a", rows_a), ("run-b", rows_b)):
        d = tmp_path / "runs" / name
        d.mkdir(parents=True)
        with open(d / "stepsweep.json", "w") as f:
            json.dump(rows, f)
    from scripts import seed_select
    res = seed_select.main(["run-a", "run-b"])
    sel = res["selected"]
    # refined min wins; run-b's 0.3 (penalty-free scale, nominally lowest)
    # is excluded by the scale guard
    assert (sel["run"], sel["step"]) == ("run-a", 200)
    assert res["num_runs"] == 1
    assert os.path.exists(tmp_path / "runs" / "seed_select.json")
    # all-legacy inputs still work (nothing to guard against)
    res_b = seed_select.main(["run-b"])
    assert res_b["selected"]["step"] == 300
