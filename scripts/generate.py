"""Standalone generation + MMD eval from a trained run (SURVEY.md §3c/§3d).

Usage:
    python scripts/generate.py <run-or-preset> [num_samples=N] [seed=S]
        [temperature=T] [step=K]

Loads `runs/<name>/` (written by train_gnf.py; the run's own config.json is
used when present, so named runs with overrides work), samples graphs via
the inverse flow + edge decoder, and reports the MMD protocol against the
held-out test split. `step=K` restores the flow from the mid-run checkpoint
at step K instead of the end-of-run params — with the quality-probe
trajectory in metrics.jsonl this turns one long run into a sweep over
stopping points.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gnfx.config import PRESETS
from gnfx.data import create_dataset, dataset_to_arrays, empirical_size_distribution
from gnfx.eval.mmd import evaluate_generated
from gnfx.models import autoencoder as ae
from gnfx.models.flow import init_flow
from gnfx.sample import sample_graphs
from gnfx.train.checkpoint import restore_checkpoint


def load_run(argv):
    """Parse CLI args, restore params (optionally a mid-run checkpoint), and
    resolve the run's train-split-selected sampling hyperparameters.
    Returns (cfg, params, step, sampling, num_samples, seed)."""
    preset = "community-small"
    num_samples, seed, temperature, step_sel, threshold = None, 0, None, None, None
    connect_isolated, variant = None, "ema"
    for a in argv:
        if a.startswith("num_samples="):
            num_samples = int(a.split("=")[1])
        elif a.startswith("seed="):
            seed = int(a.split("=")[1])
        elif a.startswith("temperature="):
            temperature = float(a.split("=")[1])
        elif a.startswith("step="):
            step_sel = int(a.split("=")[1])
        elif a.startswith("threshold="):
            threshold = float(a.split("=")[1])
        elif a.startswith("connect_isolated="):
            connect_isolated = a.split("=")[1].lower() in ("1", "true", "yes")
        elif a.startswith("variant="):
            variant = a.split("=")[1]   # "ema" (default when available) | "raw"
        elif "=" not in a:
            preset = a
    run_dir = os.path.join("runs", preset)
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        from gnfx.config import from_dict

        with open(cfg_path) as f:
            cfg = from_dict(json.load(f))
    else:
        cfg = PRESETS[preset]
        run_dir = os.path.join("runs", cfg.name)
    # default to the run's train-split-selected sampling hyperparameters
    try:
        with open(os.path.join(run_dir, "results.json")) as f:
            res = json.load(f)["results"]
    except Exception:
        res = {}
    # stepsweep persists its train-split-selected BEST row (incl.
    # decode_scale, which train_gnf's own final grid never sweeps) under
    # results.json["stepsweep_best"] — prefer it over the final-step
    # selection so sweep-selected decodes don't silently revert here.
    # NOTE: checkpoint STEP still defaults to end-of-run params; pass
    # step= explicitly to sample the sweep-selected checkpoint.
    best = res.get("stepsweep_best") or {}
    if temperature is None:
        temperature = best.get("temp", res.get("sample_temperature", 1.0))
    if threshold is None:
        threshold = best.get("threshold", res.get("sample_threshold", 0.5))
    if connect_isolated is None:
        connect_isolated = bool(best.get(
            "connect_isolated", res.get("sample_connect_isolated", False)))
    edge_sample = bool(best.get(
        "edge_sample", res.get("sample_edge_sample", False)))
    connect_components = bool(best.get(
        "connect_components", res.get("sample_connect_components", False)))
    break_triangles = bool(best.get(
        "break_triangles", res.get("sample_break_triangles", False)))
    decode_scale = float(best.get(
        "decode_scale", res.get("sample_decode_scale", 1.0)))
    for a in argv:
        if a.startswith("edge_sample="):
            edge_sample = a.split("=")[1].lower() in ("1", "true", "yes")
        elif a.startswith("connect_components="):
            connect_components = a.split("=")[1].lower() in ("1", "true", "yes")
        elif a.startswith("break_triangles="):
            break_triangles = a.split("=")[1].lower() in ("1", "true", "yes")
        elif a.startswith("decode_scale="):
            decode_scale = float(a.split("=")[1])

    template = {
        "ae": ae.init_autoencoder(jax.random.PRNGKey(0), cfg.ae),
        "flow": init_flow(jax.random.PRNGKey(0), cfg.flow),
    }
    try:
        params, step = restore_checkpoint(os.path.join(run_dir, "params"),
                                          template)
    except FileNotFoundError:
        # run still in stage 2: stage-1 AE snapshot + a flow checkpoint
        if step_sel is None:
            raise
        ae_p, _ = restore_checkpoint(os.path.join(run_dir, "params_ae"),
                                     {"ae": template["ae"]})
        params, step = {"ae": ae_p["ae"], "flow": template["flow"]}, 0
    if step_sel is not None:
        # mid-run flow checkpoint: (flow_params, opt_state[, ema]) tuple; the
        # AE stays the end-of-run one (it is frozen through stage 2 anyway)
        from gnfx.train.loop import make_optimizer

        tx = make_optimizer(cfg.train.lr, cfg.train.lr_warmup,
                            cfg.train.grad_clip, cfg.train.num_steps,
                            cfg.train.weight_decay)
        use_ema = cfg.train.ema_decay > 0.0 and variant == "ema"
        if use_ema:
            ck_template = (params["flow"], tx.init(params["flow"]),
                           params["flow"])
            state, step = restore_checkpoint(
                os.path.join(run_dir, "ckpt"), ck_template, step=step_sel
            )
            flow_p = state[2]
        else:
            ck_template = (params["flow"], tx.init(params["flow"]))
            (flow_p, _), step = restore_checkpoint(
                os.path.join(run_dir, "ckpt"), ck_template, step=step_sel
            )
        params = {"ae": params["ae"], "flow": flow_p}
    print(f"[gnfx] loaded params at step {step} from {run_dir}", flush=True)
    sampling = {"temperature": temperature, "threshold": threshold,
                "connect_isolated": connect_isolated,
                "edge_sample": edge_sample,
                "connect_components": connect_components,
                "break_triangles": break_triangles,
                "decode_scale": decode_scale}
    return cfg, params, step, sampling, num_samples, seed, run_dir


def load_eval_data(cfg, num_samples):
    """The generation-eval protocol's shared setup: dataset split, empirical
    size distribution, and the default sample count (4x the test split)."""
    train_graphs, test_graphs, max_nodes = create_dataset(
        cfg.data.dataset, seed=cfg.data.seed, num_graphs=cfg.data.num_graphs
    )
    _, n_tr = dataset_to_arrays(train_graphs, max_nodes)
    size_dist = empirical_size_distribution(n_tr, max_nodes)
    n = num_samples or max(len(test_graphs) * 4, 64)
    return train_graphs, test_graphs, max_nodes, size_dist, n


def main(argv):
    cfg, params, step, sampling, num_samples, seed, _ = load_run(argv)
    _, test_graphs, max_nodes, size_dist, n = load_eval_data(cfg, num_samples)

    t0 = time.time()
    sampled = sample_graphs(params["flow"], params["ae"], cfg.flow, cfg.ae, n,
                            size_dist, max_nodes, seed=seed,
                            batch_size=cfg.data.batch_size, **sampling)
    dt = time.time() - t0
    results = evaluate_generated(test_graphs, sampled)
    results["graphs_per_s"] = n / dt
    results["num_samples"] = n
    results.update(sampling)
    print(f"[gnfx] FINAL {json.dumps(results)}", flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
