"""Citation-graph datasets for the supervised invertible-GNN task
(SURVEY.md §2.1 #8, BASELINE config 3: Cora / Pubmed).

This box has zero network egress and no dataset files (SURVEY.md §0).
`load_citation` therefore first looks for real Planetoid-format arrays under
`data_dir` (`<name>_adj.npz`-style NumPy dumps — drop-in hook for when files
exist), and otherwise generates a fixed-seed SUBSTITUTE with matching
structure: a stochastic block model with citation-like degree statistics,
class-conditional sparse bag-of-words features, and Planetoid-style splits
(20 train nodes/class, 500 val, 1000 test). The supervised-task parity claim
(GRevNet ≈ GNN baseline within ~1 pt, SURVEY.md §6) is self-referential: both
models run on the same graph here.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass(frozen=True)
class CitationGraph:
    name: str
    adj: np.ndarray         # f32[N, N] symmetric, no self loops
    features: np.ndarray    # f32[N, F]
    labels: np.ndarray      # i32[N]
    train_mask: np.ndarray  # bool[N]
    val_mask: np.ndarray    # bool[N]
    test_mask: np.ndarray   # bool[N]

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def num_classes(self) -> int:
        return int(self.labels.max()) + 1


_SPECS = {
    # name: (nodes, classes, feature dim) ~ the real datasets' shapes
    "cora": (2708, 7, 1433),
    "pubmed": (19717, 3, 500),
    "cora-small": (600, 7, 128),   # fast CI variant
}


def load_citation(name: str, data_dir: str = "data", seed: int = 1234) -> CitationGraph:
    if name not in _SPECS:
        raise KeyError(f"unknown citation dataset {name!r}; have {sorted(_SPECS)}")
    path = os.path.join(data_dir, f"{name}.npz")
    if os.path.exists(path):
        with np.load(path) as d:
            return CitationGraph(
                name=name, adj=d["adj"].astype(np.float32),
                features=d["features"].astype(np.float32),
                labels=d["labels"].astype(np.int32),
                train_mask=d["train_mask"].astype(bool),
                val_mask=d["val_mask"].astype(bool),
                test_mask=d["test_mask"].astype(bool),
            )
    return _synthetic_citation(name, seed)


def _synthetic_citation(name: str, seed: int) -> CitationGraph:
    n, c, f = _SPECS[name]
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, size=n).astype(np.int32)

    # SBM: strong homophily (citation graphs), mean degree ~4
    mean_deg = 4.0
    p_in = mean_deg * 0.8 / (n / c)
    p_out = mean_deg * 0.2 / (n * (c - 1) / c)
    same = labels[:, None] == labels[None, :]
    prob = np.where(same, p_in, p_out)
    upper = np.triu(rng.random((n, n)) < prob, k=1)
    adj = (upper | upper.T).astype(np.float32)
    np.fill_diagonal(adj, 0.0)

    # class-conditional sparse binary features (bag-of-words-like):
    # each class owns a random subset of "topic words" with elevated rates
    feats = (rng.random((n, f)) < 0.01).astype(np.float32)
    for k in range(c):
        topic = rng.choice(f, size=max(4, f // (2 * c)), replace=False)
        rows = np.where(labels == k)[0]
        feats[np.ix_(rows, topic)] = (
            rng.random((len(rows), len(topic))) < 0.15
        ).astype(np.float32)

    train_mask = np.zeros(n, bool)
    for k in range(c):
        idx = np.where(labels == k)[0]
        train_mask[rng.choice(idx, size=min(20, len(idx)), replace=False)] = True
    rest = np.where(~train_mask)[0]
    rng.shuffle(rest)
    n_val = min(500, len(rest) // 3)
    n_test = min(1000, len(rest) - n_val)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:n_val]] = True
    test_mask[rest[n_val : n_val + n_test]] = True

    return CitationGraph(name=name, adj=adj, features=feats, labels=labels,
                         train_mask=train_mask, val_mask=val_mask,
                         test_mask=test_mask)
