"""Attribute a run's generated-connectivity gap: decode-side or flow-side?

Usage:
    python scripts/connectivity_probe.py <run-name> [num_samples=N] [step=K]

Round-1 verdict (What's weak #1): flagship community-small samples were only
55% connected while every real graph is connected. Two candidate causes:

* decode-side — the decoder (threshold or Bernoulli edge-sampling) loses
  bridge edges even on embeddings of REAL graphs. Measured by the AE
  round-trip: encode held-out test graphs, decode, check connectivity.
* flow-side — the flow's samples land in embedding configurations whose
  decoded graphs are disconnected (wrong within-community geometry).
  Measured on flow samples with NO repair, plus the split of component
  counts/sizes (many stray singletons → near-threshold edges; two big
  halves → global geometry).

Writes runs/<run>/connectivity_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import networkx as nx
import numpy as np

from gnfx.eval.selection import frac_connected
from gnfx.models import autoencoder as ae
from gnfx.sample import sample_graphs
from scripts.generate import load_eval_data, load_run


def _component_profile(graphs):
    """Connectivity stats of a graph list: fraction connected, mean number
    of components, and the mean share of nodes OUTSIDE the giant component
    (singleton spray vs split-in-half look very different here)."""
    n_comp, stray = [], []
    for g in graphs:
        if g.number_of_nodes() == 0:
            continue
        comps = sorted((len(c) for c in nx.connected_components(g)),
                       reverse=True)
        n_comp.append(len(comps))
        stray.append(1.0 - comps[0] / g.number_of_nodes())
    return {
        "frac_connected": round(frac_connected(graphs), 4),
        "mean_components": round(float(np.mean(n_comp)), 3),
        "mean_frac_outside_giant": round(float(np.mean(stray)), 4),
    }


def main(argv):
    import jax

    from gnfx.graph import arrays_to_networkx, batch_from_dense
    from gnfx.data import create_dataset, dataset_to_arrays

    cfg, params, step, sampling, num_samples, seed, run_dir = load_run(argv)
    train_g, test_g, max_n, size_dist, n = load_eval_data(cfg, num_samples)
    adj_te, n_te = dataset_to_arrays(test_g, max_n)
    gb = batch_from_dense(adj_te, n_te)

    out = {"run": cfg.name, "step": step, "num_samples": n,
           "real_train": _component_profile(train_g),
           "real_test": _component_profile(test_g)}

    # 1. decode-side: AE round-trip on REAL held-out graphs (no flow).
    #    Averaged over encoder feature draws; both decode families.
    for name, es in (("threshold", False), ("edge_sample", True)):
        profs = []
        for s in range(3):
            feats = ae.random_node_features(jax.random.PRNGKey(s), gb,
                                            cfg.ae.feature_dim)
            emb = ae.encode(params["ae"], cfg.ae, feats, gb)
            probs = np.asarray(ae.decode_edges(params["ae"], cfg.ae, emb))
            if es:
                rng = np.random.default_rng(s)
                draw = (rng.random(probs.shape) < probs)
                a = np.triu(draw, 1).astype(np.float32)
            else:
                a = np.triu(probs > sampling["threshold"], 1).astype(np.float32)
            a = a + a.transpose(0, 2, 1)
            profs.append(_component_profile(
                arrays_to_networkx(a, np.asarray(n_te))))
        out[f"ae_roundtrip_{name}"] = {
            k: round(float(np.mean([p[k] for p in profs])), 4)
            for k in profs[0]}

    # 2. flow-side: samples at the run's selected config, NO repair, for
    #    both decode families at the selected temperature/threshold.
    base = {k: v for k, v in sampling.items()
            if k not in ("connect_isolated", "connect_components",
                         "break_triangles")}
    for name, es in (("threshold", False), ("edge_sample", True)):
        kw = dict(base, edge_sample=es)
        gen = sample_graphs(params["flow"], params["ae"], cfg.flow, cfg.ae,
                            n, size_dist, max_n, seed=seed,
                            batch_size=cfg.data.batch_size, **kw)
        out[f"flow_norepair_{name}"] = _component_profile(gen)

    print("[conn]", json.dumps(out, indent=1), flush=True)
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "connectivity_probe.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
