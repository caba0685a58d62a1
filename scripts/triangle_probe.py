"""Attribute grid's clustering-MMD defect: where do the triangles come from?

Usage:
    python scripts/triangle_probe.py <run-name> [num_samples=N] [step=K]

Round-2 verdict (weak #3): grid-pca's clustering MMD is 0.89-1.06 because
generated lattices contain triangles while real grids have none (every real
node's clustering coefficient is exactly 0, so ANY triangle mass moves the
whole histogram). Candidate sources, measured separately here (the
connectivity_probe.py pattern):

* decode-side — the AE roundtrip of REAL held-out grids already creates
  triangles (the distance decoder scores any close embedding triple as a
  3-clique: a lattice's unit-diagonal neighbours are only sqrt(2) apart,
  so threshold/Bernoulli decodes near C(1-d^2) readily close them);
* flow-side — roundtrips are clean but flow samples land in embedding
  configurations whose decodes triangulate;
* repair-side — the connect_components/connect_isolated repairs add the
  shortest/highest-probability missing edge, which can close a triangle.

Writes runs/<run>/triangle_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import networkx as nx
import numpy as np

from gnfx.models import autoencoder as ae
from gnfx.sample import sample_graphs
from scripts.generate import load_eval_data, load_run


def _triangle_profile(graphs):
    tri, any_tri, clus, edges = [], [], [], []
    for g in graphs:
        if g.number_of_nodes() == 0:
            continue
        t = sum(nx.triangles(g).values()) / 3.0
        tri.append(t)
        any_tri.append(1.0 if t > 0 else 0.0)
        clus.append(float(np.mean(list(nx.clustering(g).values()))))
        edges.append(g.number_of_edges())
    return {
        "mean_triangles": round(float(np.mean(tri)), 3),
        "frac_graphs_with_triangle": round(float(np.mean(any_tri)), 4),
        "mean_clustering": round(float(np.mean(clus)), 4),
        "mean_edges": round(float(np.mean(edges)), 2),
    }


def main(argv):
    import jax

    from gnfx.data import dataset_to_arrays
    from gnfx.graph import arrays_to_networkx, batch_from_dense

    cfg, params, step, sampling, num_samples, seed, run_dir = load_run(argv)
    train_g, test_g, max_n, size_dist, n = load_eval_data(cfg, num_samples)
    adj_te, n_te = dataset_to_arrays(test_g, max_n)
    gb = batch_from_dense(adj_te, n_te)

    out = {"run": cfg.name, "step": step, "num_samples": n,
           "real_train": _triangle_profile(train_g),
           "real_test": _triangle_profile(test_g)}

    # 1. decode-side: AE roundtrip of REAL held-out graphs (no flow),
    #    both decode families at the run's selected threshold.
    for name, es in (("threshold", False), ("edge_sample", True)):
        profs = []
        for s in range(3):
            feats = ae.random_node_features(jax.random.PRNGKey(s), gb,
                                            cfg.ae.feature_dim)
            emb = ae.encode(params["ae"], cfg.ae, feats, gb)
            probs = np.asarray(ae.decode_edges(params["ae"], cfg.ae, emb))
            if es:
                rng = np.random.default_rng(s)
                a = np.triu(rng.random(probs.shape) < probs, 1)
            else:
                a = np.triu(probs > sampling["threshold"], 1)
            a = a.astype(np.float32)
            a = a + a.transpose(0, 2, 1)
            profs.append(_triangle_profile(
                arrays_to_networkx(a, np.asarray(n_te))))
        out[f"ae_roundtrip_{name}"] = {
            k: round(float(np.mean([p[k] for p in profs])), 4)
            for k in profs[0]}

    # 2. flow-side vs repair-side: samples at the selected config with and
    #    without the repairs (repairs add edges that can close triangles).
    base = {k: v for k, v in sampling.items()
            if k not in ("connect_isolated", "connect_components",
                         "break_triangles")}
    for name, kw in (
        ("norepair", base),
        ("selected", sampling),
    ):
        gen = sample_graphs(params["flow"], params["ae"], cfg.flow, cfg.ae,
                            n, size_dist, max_n, seed=seed,
                            batch_size=cfg.data.batch_size, **kw)
        out[f"flow_{name}"] = _triangle_profile(gen)

    print("[tri]", json.dumps(out, indent=1), flush=True)
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "triangle_probe.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
