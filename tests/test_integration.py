"""End-to-end integration (SURVEY.md §4.5): a tiny two-stage run on
community-small must decrease NLL and produce non-degenerate samples.
CPU-runnable (BASELINE config 1)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_smoke_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib
    train_gnf = importlib.import_module("train_gnf")

    results = train_gnf.main(["smoke", "train.num_steps=150", "ae.train_steps=150"])
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
