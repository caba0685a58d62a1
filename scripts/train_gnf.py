"""Two-stage graph-generation training CLI (SURVEY.md §3a/§3b/§3c/§3d).

Usage:
    python scripts/train_gnf.py <preset> [section.key=value ...]

e.g.
    python scripts/train_gnf.py community-small train.num_steps=2000
    python scripts/train_gnf.py smoke                      # tiny CI run
    python scripts/train_gnf.py community-small resume=1   # resume from ckpt

Runs: stage-1 auto-encoder -> frozen-encoder embeddings -> stage-2 GNF
(max-likelihood, fully-connected MP) -> inverse-flow sampling -> MMD eval
(degree / clustering / orbit) against the held-out test split. Metrics go to
<run_dir>/metrics.jsonl, final results to <run_dir>/results.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gnfx.config import load_config, to_dict, to_json
from gnfx.data import create_dataset, dataset_to_arrays, empirical_size_distribution
from gnfx.eval.mmd import evaluate_generated
from gnfx.sample import sample_graphs
from gnfx.train.loop import train_autoencoder, train_flow
from gnfx.train.metrics import MetricsWriter


def ae_config_diff(src_ae: dict, ours: dict, defaults: dict) -> dict:
    """Fields where a source run's saved AE config is incompatible with
    ours for `ae_from` reuse. The canonicalize fields are a stage-1->2
    handoff choice, not an AE training property — they may differ (that's
    the point of reuse). A key absent from the source config means the
    field was added AFTER that run was saved — the source trained with the
    behavior today's default encodes, so absent-vs-default is compatible."""
    skip = ("canonicalize", "canon_jitter")
    return {k: (src_ae.get(k), v) for k, v in ours.items()
            if k not in skip
            and (src_ae[k] != v if k in src_ae else v != defaults[k])}


def main(argv):
    overrides = [a for a in argv if a not in ("--resume",)]
    resume = "resume=1" in overrides or "--resume" in argv
    overrides = [a for a in overrides if not a.startswith("resume=")]
    # ae_from=<run-name>: reuse another run's trained stage-1 AE instead of
    # training one (stage-2 variants — canonicalization, flow arch, seeds —
    # share the AE, so retraining it per experiment is pure waste). The AE
    # config must match; checked via the checkpoint template shapes.
    ae_from = None
    for a in list(overrides):
        if a.startswith("ae_from="):
            ae_from = a.split("=", 1)[1]
            overrides.remove(a)
    # debug_nans=1: numerical tripwire (gnfx/utils/debug.py) — any NaN
    # produced under jit raises at the producing op instead of poisoning
    # the run (used to localise the round-5 deep-stack divergence class)
    if "debug_nans=1" in overrides:
        overrides.remove("debug_nans=1")
        from gnfx.utils.debug import enable_nan_checks
        enable_nan_checks()
        print("[gnfx] jax_debug_nans ON (slow; debugging only)", flush=True)
    # eval_final=0: skip the end-of-run selection grid + final sampling +
    # IWAE (at protein shape that tail costs ~1.5 h — measured: job 05b,
    # 8021 s total vs 2610 s of training). Horizon-extension jobs whose
    # quotable selection is the follow-up stepsweep use this.
    eval_final = True
    if "eval_final=0" in overrides:
        overrides.remove("eval_final=0")
        eval_final = False
    cfg = load_config(overrides)

    run_dir = os.path.join("runs", cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    from dataclasses import replace
    cfg = replace(cfg, train=replace(cfg.train,
                                     checkpoint_dir=os.path.join(run_dir, "ckpt")))
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(to_json(cfg))
    print(f"[gnfx] preset={cfg.name} backend={jax.default_backend()} "
          f"devices={jax.device_count()}", flush=True)

    t0 = time.time()
    train_graphs, test_graphs, max_nodes = create_dataset(
        cfg.data.dataset, seed=cfg.data.seed, num_graphs=cfg.data.num_graphs
    )
    adj_tr, n_tr = dataset_to_arrays(train_graphs, max_nodes)
    adj_te, n_te = dataset_to_arrays(test_graphs, max_nodes)
    print(f"[gnfx] dataset {cfg.data.dataset}: {len(train_graphs)} train / "
          f"{len(test_graphs)} test, max_nodes={max_nodes} "
          f"({time.time()-t0:.1f}s)", flush=True)

    metrics = MetricsWriter(os.path.join(run_dir, "metrics.jsonl"), resume=resume)

    # Stage 1: auto-encoder
    from gnfx.train.checkpoint import restore_checkpoint, save_checkpoint

    ae_dir = os.path.join(run_dir, "params_ae")
    t0 = time.time()

    def _restore_ae(src_dir):
        from gnfx.models import autoencoder as _ae

        template = {"ae": _ae.init_autoencoder(jax.random.PRNGKey(0), cfg.ae)}
        return restore_checkpoint(src_dir, template)[0]["ae"]

    if ae_from is not None and not (resume and os.path.isdir(ae_dir)):
        # the source AE must have been TRAINED with the same AE config;
        # shape-identical mismatches (decoder_c, aggregation, a dropped mlp
        # decoder) restore silently, so compare configs, not leaves
        src_cfg_path = os.path.join("runs", ae_from, "config.json")
        with open(src_cfg_path) as f:
            src_ae = json.load(f)["ae"]
        defaults = to_dict(dataclasses.replace(cfg, ae=type(cfg.ae)()))["ae"]
        diff = ae_config_diff(src_ae, to_dict(cfg)["ae"], defaults)
        if diff:
            raise ValueError(
                f"ae_from={ae_from}: AE config mismatch (source, ours): {diff}")
        src = os.path.join("runs", ae_from, "params_ae")
        if not os.path.isdir(src):
            # finished runs may only have the combined {ae, flow} params dir;
            # restore_checkpoint pulls only the template's leaves
            src = os.path.join("runs", ae_from, "params")
        ae_params = _restore_ae(src)
        save_checkpoint(ae_dir, 0, {"ae": ae_params})
        print(f"[gnfx] stage-1 AE reused from {src}", flush=True)
    elif resume and os.path.isdir(ae_dir):
        ae_params = _restore_ae(ae_dir)
        print(f"[gnfx] stage-1 AE restored from {ae_dir}", flush=True)
    else:
        # resume=1 also continues a PARTIAL stage-1 AE from run_dir/ckpt_ae
        # (mid-stage checkpoints — a reimage during a long AE no longer
        # costs the whole stage)
        ae_params = train_autoencoder(cfg, adj_tr, n_tr, metrics=metrics,
                                      resume=resume)
        # persist immediately: restarts resume stage 2 without retraining the
        # AE, and mid-run generation/eval (generate.py step=K) can decode
        save_checkpoint(ae_dir, cfg.ae.train_steps, {"ae": ae_params})
        print(f"[gnfx] stage-1 AE done in {time.time()-t0:.1f}s", flush=True)

    # Stage 2: flow on in-step frozen-encoder embeddings (fresh random
    # encoder features every step — the flow models the embedding
    # distribution, not a finite set of points)
    on_eval = None
    if cfg.train.eval_samples > 0:
        from gnfx.eval.mmd import clustering_stats as _cstats
        from gnfx.eval.mmd import degree_stats as _dstats

        probe_dist = empirical_size_distribution(n_tr, max_nodes)

        def on_eval(step, flow_params):
            # quality is strongly temperature-dependent (sharp decoders make
            # edge formation sensitive to embedding spread), so probe a small
            # temperature grid — plus one Bernoulli edge-sampling point (the
            # model-consistent decode often wins the final selection)
            for temp, es in ((1.0, False), (0.8, False), (0.6, False),
                             (0.9, True)):
                probe = sample_graphs(
                    flow_params, ae_params, cfg.flow, cfg.ae,
                    cfg.train.eval_samples, probe_dist, max_nodes, seed=777,
                    batch_size=cfg.data.batch_size, temperature=temp,
                    edge_sample=es,
                )
                metrics.write(
                    step, stage="quality", temperature=temp, edge_sample=es,
                    mmd_degree=_dstats(test_graphs, probe),
                    mmd_clustering=_cstats(test_graphs, probe),
                    mean_edges=float(
                        np.mean([g.number_of_edges() for g in probe])
                    ),
                )

    t0 = time.time()
    flow_params = train_flow(
        cfg, adj_tr, n_tr, ae_params, full_graph=True, metrics=metrics,
        resume=resume, eval_data=(adj_te, n_te), on_eval=on_eval,
    )
    print(f"[gnfx] stage-2 flow done in {time.time()-t0:.1f}s", flush=True)

    # persist both stages' params for standalone generation/eval
    from gnfx.train.checkpoint import save_checkpoint
    save_checkpoint(os.path.join(run_dir, "params"), cfg.train.num_steps,
                    {"ae": ae_params, "flow": flow_params},
                    meta={"preset": cfg.name})

    if not eval_final:
        from gnfx.train.checkpoint import commit_run_artifacts
        commit_run_artifacts(run_dir, step=cfg.train.num_steps, force=True,
                             label="train (eval_final=0)")
        metrics.write(cfg.train.num_steps, stage="final_skipped")
        metrics.close()
        print("[gnfx] eval_final=0: selection grid + final eval skipped "
              "(run stepsweep for the quotable selection)", flush=True)
        return {}

    # Generation-hyperparameter selection on the TRAIN split (connectivity-
    # aware score), then final sampling + full MMD eval against the held-out
    # test split.
    size_dist = empirical_size_distribution(n_tr, max_nodes)
    from gnfx.eval.selection import frac_connected, selection_score

    conn_tr = frac_connected(train_graphs)
    # decode candidates: thresholds (reference rule, density calibration) +
    # Bernoulli edge sampling (model-consistent decode); repairs: none /
    # isolated-node fixup / component merge
    decodes = [(0.3, False), (0.5, False), (0.7, False), (0.8, False), (0.5, True)]
    # repairs: (connect_isolated, connect_components, break_triangles).
    # break_triangles is only OFFERED when the train data is triangle-free
    # (grids): decode-support conditioning, same licence as
    # connect_components on all-connected data (gnfx/sample.py).
    repairs = [(False, False, False), (True, False, False),
               (False, True, False)]
    import networkx as nx
    if all(sum(nx.triangles(g).values()) == 0 for g in train_graphs):
        repairs += [(False, False, True), (False, True, True)]
    temps = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)
    n_probe = 64
    screen_orbit = True
    if max_nodes >= 128:
        # big-N screening: the grid's cost is HOST-side graph statistics
        # (orbit ESU on dense low-threshold decodes at N≈500 runs minutes
        # PER PROBE — measured on protein-v1), not device sampling. Shrink
        # the grid and the probe set; the final eval below stays full.
        # Orbit leaves the screen (degree+clustering+connectivity rank the
        # grid; see gnfx/eval/selection.py) — the budget goes to a finer
        # temperature grid instead: protein's decode density is extremely
        # steep in T (mean edges 136/2989/20478 at T=1.0/0.8/0.6, real
        # ~975), so the density-matching T falls between the coarse points.
        temps = (1.0, 0.9, 0.8, 0.7, 0.6)
        decodes = [(0.5, False), (0.3, False), (0.5, True)]
        n_probe = 32
        screen_orbit = False
    best = dict(temp=1.0, thr=0.5, ci=False, es=False, cc=False, bt=False)
    best_score = float("inf")
    for temp in temps:
        for thr, es in decodes:
            for ci, cc, bt in repairs:
                probe = sample_graphs(
                    flow_params, ae_params, cfg.flow, cfg.ae, n_probe,
                    size_dist, max_nodes, seed=cfg.train.seed + 100,
                    batch_size=cfg.data.batch_size,
                    temperature=temp, threshold=thr, connect_isolated=ci,
                    edge_sample=es, connect_components=cc,
                    break_triangles=bt,
                )
                parts = selection_score(train_graphs, probe,
                                        ref_frac_connected=conn_tr,
                                        include_orbit=screen_orbit)
                score = parts["score"]
                print(f"[gnfx] temp {temp} thr {thr} ci {int(ci)} es {int(es)}"
                      f" cc {int(cc)} bt {int(bt)}: train-split score "
                      f"{score:.3f} (mmd {parts['mmd_sum']:.3f} "
                      f"conn {parts['gen_frac_connected']:.2f})", flush=True)
                if score < best_score:
                    best = dict(temp=temp, thr=thr, ci=ci, es=es, cc=cc, bt=bt)
                    best_score = score

    num_samples = max(len(test_graphs) * 4, 64)
    sample_kw = dict(temperature=best["temp"], threshold=best["thr"],
                     connect_isolated=best["ci"], edge_sample=best["es"],
                     connect_components=best["cc"],
                     break_triangles=best["bt"])
    # warm-up at the selected config (one batch) so graphs_per_s reports
    # sustained throughput, not compile/dispatch-cold latency
    sample_graphs(flow_params, ae_params, cfg.flow, cfg.ae,
                  cfg.data.batch_size, size_dist, max_nodes,
                  seed=cfg.train.seed, batch_size=cfg.data.batch_size,
                  **sample_kw)
    t0 = time.time()
    sampled = sample_graphs(
        flow_params, ae_params, cfg.flow, cfg.ae, num_samples, size_dist,
        max_nodes, seed=cfg.train.seed, batch_size=cfg.data.batch_size,
        **sample_kw,
    )
    sample_time = time.time() - t0
    results = evaluate_generated(test_graphs, sampled)
    results["graphs_per_s"] = num_samples / sample_time
    results["num_samples"] = num_samples
    results["sample_temperature"] = best["temp"]
    results["sample_threshold"] = best["thr"]
    results["sample_connect_isolated"] = best["ci"]
    results["sample_edge_sample"] = best["es"]
    results["sample_connect_components"] = best["cc"]
    results["sample_break_triangles"] = best["bt"]
    results["train_selection_score"] = round(best_score, 4)

    # importance-weighted held-out NLL of full graphs (particle-sharded
    # IWAE over the device mesh — BASELINE "held-out NLL" metric)
    try:
        from gnfx.graph import batch_from_dense
        from gnfx.parallel.mesh import make_mesh
        from gnfx.parallel.smc import heldout_nll_iwae

        mesh = make_mesh()
        n_eval = min(8, adj_te.shape[0])
        egb = batch_from_dense(adj_te[:n_eval], n_te[:n_eval])
        particles = 64 * mesh.shape["data"]
        nlls = heldout_nll_iwae(flow_params, ae_params, cfg.flow, cfg.ae,
                                egb, particles, jax.random.PRNGKey(5), mesh)
        results["heldout_graph_nll_iwae"] = float(np.mean(np.asarray(nlls)))
        results["iwae_particles"] = particles
    except Exception as e:  # eval is auxiliary; never fail the run
        results["heldout_graph_nll_iwae_error"] = f"{type(e).__name__}: {e}"[:200]
    metrics.write(cfg.train.num_steps, stage="final", **results)
    with open(os.path.join(run_dir, "results.json"), "w") as f:
        json.dump({"config": to_dict(cfg), "results": results}, f, indent=2)
    print(f"[gnfx] FINAL {json.dumps(results)}", flush=True)
    metrics.close()
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
