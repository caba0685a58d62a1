"""Connectivity-aware selection (gnfx.eval.selection) + decode repair
(gnfx.sample.connect_components_np) + metrics wall-clock continuity."""

import json

import networkx as nx
import numpy as np

from gnfx.eval.selection import frac_connected, selection_score
from gnfx.sample import connect_components_np


def _adj(edges, n):
    a = np.zeros((n, n), np.float32)
    for u, v in edges:
        a[u, v] = a[v, u] = 1.0
    return a


def test_frac_connected():
    g1 = nx.path_graph(4)
    g2 = nx.Graph()
    g2.add_nodes_from(range(3))          # 3 isolated nodes
    assert frac_connected([g1, g1]) == 1.0
    assert frac_connected([g1, g2]) == 0.5
    assert frac_connected([]) == 0.0


def test_selection_score_penalises_disconnection():
    ref = [nx.path_graph(5) for _ in range(4)]           # all connected
    disconnected = []
    for _ in range(4):
        g = nx.path_graph(5)
        g.remove_edge(2, 3)                               # two components
        disconnected.append(g)
    s_conn = selection_score(ref, ref)
    s_disc = selection_score(ref, disconnected)
    assert s_conn["connectivity_penalty"] == 0.0
    assert s_disc["connectivity_penalty"] == 1.0          # gap 1.0, weight 1.0
    assert s_disc["score"] > s_disc["mmd_sum"]
    # extra connectivity is never rewarded below zero penalty
    assert selection_score(disconnected, ref)["connectivity_penalty"] == 0.0


def test_selection_score_orbit_free_screen():
    # Big-N screening mode: include_orbit=False drops exactly the orbit
    # term (degree+clustering+penalty unchanged) — used where orbit ESU on
    # dense N≈500 probes dominates sweep cost (scripts/stepsweep.py).
    ref = [nx.cycle_graph(6) for _ in range(3)]
    gen = [nx.complete_graph(6) for _ in range(3)]        # triangle-rich
    full = selection_score(ref, gen)
    screen = selection_score(ref, gen, include_orbit=False)
    assert screen["mmd_sum"] < full["mmd_sum"]            # orbit term > 0 here
    assert screen["connectivity_penalty"] == full["connectivity_penalty"]
    # identical sets still score 0 without the orbit term
    assert selection_score(ref, ref, include_orbit=False)["mmd_sum"] == 0.0


def test_connect_components_merges_by_probability():
    # two components {0,1} and {2,3}; the repair must add the single
    # highest-probability cross edge (1, 2), not (0, 3)
    n = 6  # two padded slots
    adj = _adj([(0, 1), (2, 3)], n)
    probs = np.zeros((n, n), np.float32)
    probs[1, 2] = probs[2, 1] = 0.9
    probs[0, 3] = probs[3, 0] = 0.4
    out = connect_components_np(adj, probs, 4)
    assert out[1, 2] == 1.0 and out[2, 1] == 1.0
    assert out[0, 3] == 0.0
    # padding untouched
    assert out[4:, :].sum() == 0.0 and out[:, 4:].sum() == 0.0
    labels = nx.from_numpy_array(out[:4, :4])
    assert nx.is_connected(labels)


def test_connect_components_handles_many_components_and_noop():
    n = 5
    adj = np.zeros((n, n), np.float32)                    # 5 singletons
    rng = np.random.default_rng(0)
    probs = rng.random((n, n)).astype(np.float32)
    probs = np.triu(probs, 1)
    probs = probs + probs.T
    out = connect_components_np(adj, probs, n)
    g = nx.from_numpy_array(out)
    assert nx.is_connected(g)
    assert out.sum() == 2 * (n - 1)                       # exactly a tree
    # already-connected input is returned unchanged
    full = _adj([(0, 1), (1, 2), (2, 3), (3, 4)], n)
    np.testing.assert_array_equal(connect_components_np(full, probs, n), full)
    # n<=1 trivially fine
    np.testing.assert_array_equal(
        connect_components_np(adj, probs, 1), adj)


def test_metrics_writer_wall_s_monotonic_across_resume(tmp_path):
    from gnfx.train.metrics import MetricsWriter

    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w._t0 -= 100.0                                        # fake 100 s of work
    w.write(1, loss=1.0)
    w.close()
    w2 = MetricsWriter(path, resume=True)
    r = w2.write(2, loss=0.5)
    w2.close()
    rows = [json.loads(line) for line in open(path)]
    assert len(rows) == 2
    assert rows[1]["wall_s"] >= rows[0]["wall_s"] >= 100.0
    assert r["wall_s"] >= 100.0
