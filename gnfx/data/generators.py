"""Graph dataset generators (GraphRNN / GNF lineage).

Covers SURVEY.md §2.1 #8. The reference follows GraphRNN's `create_graphs`:
community-small, ego-small (Citeseer egos), protein. This box has **zero
network egress and no dataset files** (SURVEY.md §0), so:

* ``community-small`` — generated exactly in the published spirit: two
  Erdős–Rényi(p=0.7) communities of equal size c ∈ [6, 10] (so 12 ≤ |V| ≤ 20),
  joined by ~0.05·|V| random inter-community edges. 100 graphs.
* ``ego-small``     — the reference extracts 1-hop ego nets from Citeseer
  (4 ≤ |V| ≤ 18, 200 graphs). Citeseer is not available offline, so egos are
  extracted from a fixed-seed synthetic citation-like source graph
  (powerlaw-cluster, matching citation degree statistics). SUBSTITUTION —
  documented here and in README; MMD parity is self-referential per
  SURVEY.md §6 (train-set vs generated-set from the *same* distribution).
* ``protein``       — the reference uses the DD protein set (~100–500 nodes);
  unavailable offline. Substituted with fixed-seed random geometric graphs
  (proteins are spatial contact graphs), n ∈ [100, 500]. SUBSTITUTION.

All generators are deterministic given `seed`, return `list[networkx.Graph]`,
and datasets are split 80/20 train/test in generation order (the GraphRNN
protocol's split).
"""

from __future__ import annotations

import networkx as nx
import numpy as np


def _two_community(rng: np.random.Generator) -> nx.Graph:
    c = int(rng.integers(6, 11))  # community size, |V| = 2c in [12, 20]
    g1 = nx.gnp_random_graph(c, 0.7, seed=int(rng.integers(0, 2**31)))
    g2 = nx.gnp_random_graph(c, 0.7, seed=int(rng.integers(0, 2**31)))
    g = nx.disjoint_union(g1, g2)
    n_inter = max(1, int(round(0.05 * g.number_of_nodes())))
    for _ in range(n_inter):
        u = int(rng.integers(0, c))
        v = int(rng.integers(c, 2 * c))
        g.add_edge(u, v)
    return g


def generate_community_small(num_graphs: int = 100, seed: int = 1234):
    rng = np.random.default_rng(seed)
    return [_two_community(rng) for _ in range(num_graphs)]


def _citation_like_source(seed: int, n: int = 2000) -> nx.Graph:
    """Fixed-seed stand-in for the Citeseer graph (offline substitution)."""
    return nx.powerlaw_cluster_graph(n, m=2, p=0.3, seed=seed)


def generate_ego_small(
    num_graphs: int = 200, seed: int = 1234, min_nodes: int = 4, max_nodes: int = 18
):
    src = _citation_like_source(seed)
    rng = np.random.default_rng(seed + 1)
    nodes = list(src.nodes())
    out = []
    tried = 0
    while len(out) < num_graphs and tried < 100 * num_graphs:
        tried += 1
        center = nodes[int(rng.integers(0, len(nodes)))]
        ego = nx.ego_graph(src, center, radius=1)
        if min_nodes <= ego.number_of_nodes() <= max_nodes:
            out.append(nx.convert_node_labels_to_integers(ego))
    if len(out) < num_graphs:
        raise RuntimeError("ego extraction failed to reach the requested count")
    return out


def generate_protein(
    num_graphs: int = 100, seed: int = 1234, min_nodes: int = 100, max_nodes: int = 500
):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        # radius tuned for mean degree ~6, protein-contact-like
        radius = np.sqrt(7.0 / (np.pi * n))
        g = nx.random_geometric_graph(n, radius, seed=int(rng.integers(0, 2**31)))
        for _, d in g.nodes(data=True):
            d.clear()  # drop pos attributes; structure only
        out.append(g)
    return out


def generate_grid(num_graphs: int = 100, seed: int = 1234):
    """Small 2D grids (a standard GraphRNN extra; cheap sanity dataset)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_graphs):
        h = int(rng.integers(2, 5))
        w = int(rng.integers(2, 6))
        out.append(nx.convert_node_labels_to_integers(nx.grid_2d_graph(h, w)))
    return out


DATASETS = {
    "community-small": generate_community_small,
    "ego-small": generate_ego_small,
    "protein": generate_protein,
    "grid": generate_grid,
}

# Padding buckets per dataset (SURVEY.md §5): max node slots for the dense batch.
MAX_NODES = {
    "community-small": 20,
    "ego-small": 18,
    "protein": 512,
    "grid": 24,
}


def _load_real_graphs(name: str, data_dir: str = "data"):
    """Drop-in hook for the REAL datasets (docs/DATA.md): if
    `<data_dir>/<name>.graphs.npz` exists — `adj` f32[B, N, N] padded
    symmetric adjacencies + `n_node` i32[B] — it replaces the offline
    substitute generator entirely. Returns (graphs, max_nodes) or None."""
    import os

    path = os.path.join(data_dir, f"{name}.graphs.npz")
    if not os.path.exists(path):
        return None
    from gnfx.graph import arrays_to_networkx

    with np.load(path) as d:
        adj = d["adj"].astype(np.float32)
        n_node = d["n_node"].astype(np.int32)
    return arrays_to_networkx(adj, n_node), int(adj.shape[1])


def create_dataset(name: str, seed: int = 1234, num_graphs: int | None = None):
    """Returns (train_graphs, test_graphs, max_nodes) with the 80/20 split.

    Real data (when present under data/ — see `_load_real_graphs`) wins over
    the offline substitute generators; `seed` then only matters for parity
    with generator-based configs, not for the data itself."""
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)}")
    real = _load_real_graphs(name)
    if real is not None:
        graphs, max_nodes = real
        if num_graphs is not None:
            graphs = graphs[:num_graphs]
    else:
        kwargs = {"seed": seed}
        if num_graphs is not None:
            kwargs["num_graphs"] = num_graphs
        graphs = DATASETS[name](**kwargs)
        max_nodes = MAX_NODES[name]
    n_train = int(0.8 * len(graphs))
    return graphs[:n_train], graphs[n_train:], max_nodes
