"""Training loops for the two-stage generation pipeline (SURVEY.md §3a/§3b).

Stage 1: train the auto-encoder (BCE edge reconstruction, random node
features resampled every step). Stage 2: freeze the encoder, materialise
embeddings for the whole train set, train the GNF on them with message
passing over the *fully-connected* graph (structure unknown at sample time —
SURVEY.md §2.3).

Everything per-step is one donated `jit` call; the host loop only slices
pre-packed arrays and logs. The gradient all-reduce for a sharded batch is
implicit in `jit` with a data-sharded input (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnfx.config import ExperimentConfig
from gnfx.data.batching import (
    device_stacked_repeat_batches, repeat_batches, stacked_repeat_batches,
)
from gnfx.graph import GraphBatch, batch_from_dense
from gnfx.models import autoencoder as ae
from gnfx.models.flow import FlowConfig, init_flow, log_prob
from gnfx.train.checkpoint import (commit_run_artifacts, latest_step,
                                   restore_checkpoint, save_checkpoint)
from gnfx.utils.profiling import StepTimer, trace_context

# Cooperative wind-down (tools/wind_down.sh): when this file appears, the
# flow loop checkpoints and exits at the next chunk boundary, so a long
# training job releases the TPU chip in seconds instead of being killed
# mid-run (exit code 3 = incomplete, never marked done-ok by the worker).
STOP_SENTINEL = os.environ.get("GNFX_STOP_SENTINEL", "/tmp/tpu_jobs/STOP")
from gnfx.train.metrics import MetricsWriter


def make_optimizer(lr: float, warmup: int, grad_clip: float, num_steps: int,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=max(warmup, 1),
        decay_steps=max(num_steps, warmup + 1),
        end_value=lr * 0.1,
    )
    chain = [optax.clip_by_global_norm(grad_clip)]
    if weight_decay > 0:
        chain.append(optax.adamw(sched, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Stage 1: auto-encoder
# ---------------------------------------------------------------------------

def make_ae_step(cfg: ExperimentConfig, tx: optax.GradientTransformation):
    acfg = cfg.ae

    def one_step(params, opt_state, graph: GraphBatch, key):
        feats = ae.random_node_features(key, graph, acfg.feature_dim)

        def loss_fn(p):
            return ae.reconstruction_loss(p, acfg, feats, graph)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(one_step, donate_argnums=(0, 1)), one_step


def train_autoencoder(
    cfg: ExperimentConfig,
    adj: np.ndarray,
    n_node: np.ndarray,
    *,
    metrics: MetricsWriter | None = None,
    resume: bool = False,
) -> dict:
    acfg = cfg.ae
    tcfg = cfg.train
    key = jax.random.PRNGKey(tcfg.seed)
    params = ae.init_autoencoder(key, acfg)
    tx = make_optimizer(acfg.lr, tcfg.lr_warmup, tcfg.grad_clip,
                        acfg.train_steps)
    opt_state = tx.init(params)
    _, one_step = make_ae_step(cfg, tx)
    multi_step = make_multi_step(one_step, key)

    # Mid-stage checkpoint/resume: the stage-1 AE used to checkpoint only at
    # completion, so a crash/reimage during a long AE (protein: 15k steps at
    # N=512) lost the whole stage. The data stream is a pure function of
    # (seed, step), so resume is exact — same keys, same batch order.
    run_dir = os.path.dirname(tcfg.checkpoint_dir)
    ae_ckpt_dir = os.path.join(run_dir, "ckpt_ae")
    # persistence is opt-in (resume jobs / cadence-commit jobs): library
    # callers with the default checkpoint_dir (tests, ae_ceiling screens)
    # must not litter ckpt_ae/ into their CWD
    persist = resume or tcfg.git_commit_s > 0
    start_step = 0
    if resume and latest_step(ae_ckpt_dir) is not None:
        (params, opt_state), start_step = restore_checkpoint(
            ae_ckpt_dir, (params, opt_state))
        print(f"[gnfx] stage-1 AE resumed at step {start_step} "
              f"from {ae_ckpt_dir}", flush=True)
        if start_step >= acfg.train_steps:
            return params

    chunk = max(1, tcfg.steps_per_call)
    # device-resident data: same per-step batches, but only a [K, B] index
    # array crosses host->device per chunk (see device_stacked_repeat_batches
    # — the relay retains host copies of transfers; raw N=512 adjacency
    # streaming leaked ~5 GB/min and OOM-killed the round-4 protein job)
    batches = device_stacked_repeat_batches(
        adj, n_node, cfg.data.batch_size, acfg.train_steps, chunk,
        seed=cfg.data.seed, start_step=start_step)
    for steps, gb in batches:
        params, opt_state, losses, auxes = multi_step(
            params, opt_state, gb, jnp.asarray(steps)
        )
        # fetching per-step metrics syncs once per chunk — this also bounds
        # the async dispatch queue (unbounded queues were observed to
        # accumulate 128 GB of host-side buffers at protein scale)
        losses = np.asarray(losses)
        auxes = {k: np.asarray(v) for k, v in auxes.items()}
        if metrics is not None:
            for j, s in enumerate(steps):
                if s % tcfg.log_every == 0 or s == acfg.train_steps - 1:
                    metrics.write(int(s), stage="ae", bce=losses[j],
                                  **{k: v[j] for k, v in auxes.items()})
        chunk_end = int(steps[-1]) + 1
        last = chunk_end == acfg.train_steps
        stop = persist and os.path.exists(STOP_SENTINEL) and not last
        if persist and (stop or last or any(
                s % tcfg.checkpoint_every == 0 and s > 0 for s in steps)):
            save_checkpoint(ae_ckpt_dir, chunk_end, (params, opt_state),
                            keep=2)
            if tcfg.git_commit_s > 0:
                commit_run_artifacts(run_dir, chunk_end,
                                     min_interval_s=tcfg.git_commit_s,
                                     force=stop, label="in-job AE checkpoint")
        if stop:
            print(f"[gnfx] STOP sentinel at AE step {chunk_end} — "
                  "checkpointed, exiting (resume=1 continues)", flush=True)
            raise SystemExit(3)
    return params


def compute_embeddings(
    ae_params: dict, cfg: ExperimentConfig, adj: np.ndarray, n_node: np.ndarray,
    *, seed: int = 7, jitter: bool = False,
) -> np.ndarray:
    """Frozen-encoder embeddings for every graph (the stage-1→2 handoff,
    SURVEY.md §3b). Features fixed per graph index for determinism.

    With canonicalization on, jitter defaults OFF (deterministic eval
    handoff). Pass jitter=True if these embeddings feed flow TRAINING
    (train_flow(embeddings=...)): jitterless canonicalized clouds are
    exactly degenerate (zero mean / zero trailing principal dims), which
    gives the flow unbounded likelihood directions."""
    acfg = cfg.ae
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def embed(graph: GraphBatch, k):
        k_feat, k_canon = jax.random.split(k)
        feats = ae.random_node_features(k_feat, graph, acfg.feature_dim)
        x = ae.encode(ae_params, acfg, feats, graph)
        return ae.canonicalize_embeddings(
            x, acfg, graph.node_mask, key=k_canon if jitter else None)

    out = []
    bsz = cfg.data.batch_size
    num = adj.shape[0]
    for start in range(0, num, bsz):
        idx = np.arange(start, min(start + bsz, num))
        # pad the final slice to keep the jit shape static
        pad = bsz - len(idx)
        idx_p = np.concatenate([idx, np.zeros(pad, np.int64)]) if pad else idx
        gb = batch_from_dense(adj[idx_p], n_node[idx_p])
        emb = embed(gb, jax.random.fold_in(key, start))
        out.append(np.asarray(emb[: len(idx)]))
    return np.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# Stage 2: flow over embeddings
# ---------------------------------------------------------------------------

def make_flow_step(fcfg: FlowConfig, tx: optax.GradientTransformation,
                   *, full_graph: bool, ae_params=None, acfg=None):
    """Flow training step. When `ae_params` is given, node embeddings are
    recomputed INSIDE the step from freshly sampled random encoder features
    (encoder frozen): the flow then models the embedding *distribution*
    rather than a finite set of materialised points — materialising once
    made the flow memorise the train embeddings (train NLL/dim → −3) while
    held-out NLL diverged. Without `ae_params`, `graph.nodes` are the data
    (plain density estimation)."""

    def embed(graph: GraphBatch, key):
        # split ONLY when canonicalizing (jitter needs its own key) so the
        # canonicalize="none" feature stream — and bit-exact resume of
        # pre-canonicalization checkpoints — is unchanged
        if acfg.canonicalize != "none":
            key, k_canon = jax.random.split(key)
        feats = ae.random_node_features(key, graph, acfg.feature_dim)
        x = ae.encode(ae_params, acfg, feats, graph)
        if acfg.canonicalize != "none":
            x = ae.canonicalize_embeddings(x, acfg, graph.node_mask, k_canon)
        return jax.lax.stop_gradient(x)

    def one_step(params, opt_state, graph: GraphBatch, key):
        g = graph.fully_connected() if full_graph else graph
        x = embed(graph, key) if ae_params is not None else graph.nodes

        def loss_fn(p):
            lp = log_prob(p, fcfg, x, g)
            dims = jnp.maximum(
                jnp.sum(graph.n_node).astype(jnp.float32) * fcfg.node_dim, 1.0
            )
            nll_per_dim = -jnp.sum(lp) / dims
            return nll_per_dim, {"nll_per_graph": -jnp.mean(lp)}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, loss, {**aux, "grad_norm": gnorm}

    step = jax.jit(one_step, donate_argnums=(0, 1))
    return step, embed, one_step


def make_multi_step(one_step, base_key, ema_decay: float = 0.0):
    """Scan-over-steps training: K full optimizer steps in ONE jit call.

    At the small shapes this framework targets (B=32, N=20) a single step
    is dispatch-latency-bound, not compute-bound — per-call overhead through
    the PJRT relay dwarfs device time. Scanning the step body over a stacked
    [K, B, ...] batch chunk amortises dispatch across K steps while keeping
    per-step semantics bit-identical to the unchunked loop: the same
    `fold_in(base_key, step)` keys, the same data order (a pure function of
    (seed, step)), the same optimizer-schedule counts. Returns per-step
    (losses f32[K], aux dict of f32[K]) so logging stays exact.

    With `ema_decay > 0` the carry also holds an exponential moving average
    of the params, updated once per optimizer step inside the scan (so the
    EMA is chunk-size invariant too)."""

    if ema_decay <= 0.0:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state, graphs: GraphBatch, steps):
            def body(carry, inp):
                params, opt_state = carry
                gb, step_i = inp
                key = jax.random.fold_in(base_key, step_i)
                params, opt_state, loss, aux = one_step(params, opt_state, gb, key)
                return (params, opt_state), (loss, aux)

            (params, opt_state), (losses, auxes) = jax.lax.scan(
                body, (params, opt_state), (graphs, steps)
            )
            return params, opt_state, losses, auxes

        return multi_step

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step_ema(params, opt_state, ema, graphs: GraphBatch, steps):
        def body(carry, inp):
            params, opt_state, ema = carry
            gb, step_i = inp
            key = jax.random.fold_in(base_key, step_i)
            params, opt_state, loss, aux = one_step(params, opt_state, gb, key)
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
            )
            return (params, opt_state, ema), (loss, aux)

        (params, opt_state, ema), (losses, auxes) = jax.lax.scan(
            body, (params, opt_state, ema), (graphs, steps)
        )
        return params, opt_state, ema, losses, auxes

    return multi_step_ema


def make_flow_eval(fcfg: FlowConfig, *, full_graph: bool, embed=None):
    @jax.jit
    def eval_nll(params, graph: GraphBatch, key):
        g = graph.fully_connected() if full_graph else graph
        x = embed(graph, key) if embed is not None else graph.nodes
        lp = log_prob(params, fcfg, x, g)
        dims = jnp.maximum(
            jnp.sum(graph.n_node).astype(jnp.float32) * fcfg.node_dim, 1.0
        )
        return -jnp.sum(lp) / dims, -jnp.mean(lp)

    return eval_nll


def train_flow(
    cfg: ExperimentConfig,
    adj: np.ndarray,
    n_node: np.ndarray,
    ae_params: dict | None = None,
    *,
    embeddings: np.ndarray | None = None,
    full_graph: bool = True,
    metrics: MetricsWriter | None = None,
    resume: bool = False,
    eval_data: Tuple[np.ndarray, np.ndarray] | None = None,
    mesh=None,
    on_eval=None,
) -> dict:
    """Maximum-likelihood training of the GNF on node embeddings (computed
    in-step from the frozen encoder when `ae_params` is given, else taken
    from `embeddings`). Checkpoints (params, opt_state) at cadence; resumes
    exactly (data order is a pure function of (seed, step))."""
    tcfg = cfg.train
    fcfg = cfg.flow
    key = jax.random.PRNGKey(tcfg.seed + 1)
    data_mean = data_std = None
    if fcfg.use_actnorm:
        # actnorm init from per-dim embedding statistics over a few batches
        stat_src = []
        for i, gb0 in enumerate(
            repeat_batches(adj, n_node, cfg.data.batch_size, 4,
                           seed=cfg.data.seed + 9, nodes=embeddings)
        ):
            if ae_params is not None:
                feats = ae.random_node_features(
                    jax.random.fold_in(key, 10_000 + i), gb0, cfg.ae.feature_dim
                )
                x0 = ae.encode(ae_params, cfg.ae, feats, gb0)
                # WITH jitter: training data carries it, and under pca the
                # jitterless trailing principal dims have exactly zero std
                # (centered n-point clouds have rank <= n-1), which would
                # initialize ActNorm with a ~1/eps scale and blow up step 0
                x0 = ae.canonicalize_embeddings(
                    x0, cfg.ae, gb0.node_mask,
                    key=jax.random.fold_in(key, 20_000 + i))
            else:
                x0 = gb0.nodes
            m = np.asarray(gb0.node_mask) > 0
            stat_src.append(np.asarray(x0)[m])
        flat = np.concatenate(stat_src, axis=0)
        data_mean, data_std = flat.mean(axis=0), flat.std(axis=0)
    params = init_flow(key, fcfg, data_mean, data_std)
    tx = make_optimizer(tcfg.lr, tcfg.lr_warmup, tcfg.grad_clip, tcfg.num_steps,
                        tcfg.weight_decay)
    opt_state = tx.init(params)
    use_ema = tcfg.ema_decay > 0.0
    ema = jax.tree.map(jnp.copy, params) if use_ema else None
    start_step = 0
    if resume:
        last = latest_step(tcfg.checkpoint_dir)
        if last is not None:
            if use_ema:
                try:
                    (params, opt_state, ema), start_step = restore_checkpoint(
                        tcfg.checkpoint_dir, (params, opt_state, ema)
                    )
                except KeyError:
                    # checkpoint from a pre-EMA run: seed the EMA at the
                    # restored params
                    (params, opt_state), start_step = restore_checkpoint(
                        tcfg.checkpoint_dir, (params, opt_state)
                    )
                    ema = jax.tree.map(jnp.copy, params)
            else:
                (params, opt_state), start_step = restore_checkpoint(
                    tcfg.checkpoint_dir, (params, opt_state)
                )
    _, embed, one_step = make_flow_step(fcfg, tx, full_graph=full_graph,
                                        ae_params=ae_params, acfg=cfg.ae)
    multi_step = make_multi_step(one_step, key, tcfg.ema_decay)
    eval_fn = make_flow_eval(
        fcfg, full_graph=full_graph,
        embed=embed if ae_params is not None else None,
    )

    chunk = max(1, tcfg.steps_per_call)
    # single-device: device-resident dataset + on-device gather (only a
    # [K, B] index transfer per chunk — see device_stacked_repeat_batches).
    # Mesh runs keep the host path: shard_batch places each chunk across
    # the data axis explicitly.
    if mesh is None:
        batches = device_stacked_repeat_batches(
            adj, n_node, cfg.data.batch_size, tcfg.num_steps, chunk,
            seed=cfg.data.seed + 1, start_step=start_step, nodes=embeddings,
        )
    else:
        batches = stacked_repeat_batches(
            adj, n_node, cfg.data.batch_size, tcfg.num_steps, chunk,
            seed=cfg.data.seed + 1, start_step=start_step, nodes=embeddings,
        )
    if mesh is not None:
        # data-parallel: batch sharded over the mesh's data axis, params
        # replicated; the gradient all-reduce is jit's implicit psum
        from gnfx.parallel.mesh import replicate, shard_batch

        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        if use_ema:
            ema = replicate(ema, mesh)

    eval_key = jax.random.fold_in(key, 2**20)
    trace_dir = os.path.join(os.path.dirname(tcfg.checkpoint_dir), "trace")
    timer = StepTimer()
    for chunk_i, (steps, gb) in enumerate(batches):
        if mesh is not None:
            gb = shard_batch(gb, mesh, stacked=True)
        # profile chunks [1, trace_chunks] (skip chunk 0: compile); the
        # metric-array fetch below syncs inside the context so the trace
        # holds the full device timeline of the chunk
        do_trace = 1 <= chunk_i <= tcfg.trace_chunks
        with trace_context(trace_dir, enabled=do_trace):
            if use_ema:
                params, opt_state, ema, losses, auxes = multi_step(
                    params, opt_state, ema, gb, jnp.asarray(steps)
                )
            else:
                params, opt_state, losses, auxes = multi_step(
                    params, opt_state, gb, jnp.asarray(steps)
                )
            # fetching the per-step metric arrays syncs once per chunk, which
            # also bounds the async dispatch queue (see AE loop)
            losses = np.asarray(losses)
            auxes = {k: np.asarray(v) for k, v in auxes.items()}
        timer.tick(len(steps))
        if do_trace and chunk_i == tcfg.trace_chunks:
            print(f"[gnfx] profiler trace written to {trace_dir}", flush=True)
        chunk_end = int(steps[-1]) + 1
        last = chunk_end == tcfg.num_steps
        if metrics is not None:
            for j, s in enumerate(steps):
                if s % tcfg.log_every == 0 or s == tcfg.num_steps - 1:
                    metrics.write(int(s), stage="flow", nll_per_dim=losses[j],
                                  **{k: v[j] for k, v in auxes.items()})
        hit_eval = any(s % tcfg.eval_every == 0 for s in steps) or last
        if hit_eval and metrics is not None:
            # sustained steps/s since the last eval window (StepTimer: the
            # chunk fetch above already synced, so no extra device sync)
            metrics.write(chunk_end - 1, stage="throughput",
                          steps_per_s=timer.rate())
        eval_params = ema if use_ema else params
        if hit_eval and on_eval is not None:
            # host-side probe hook (e.g. sampled-graph quality MMDs)
            on_eval(chunk_end - 1, eval_params)
        if hit_eval and eval_data is not None:
            e_adj, e_n = eval_data[0], eval_data[1]
            e_emb = eval_data[2] if len(eval_data) > 2 else None
            egb = batch_from_dense(e_adj, e_n, e_emb)
            nll_dim, nll_graph = eval_fn(eval_params, egb, eval_key)
            if metrics is not None:
                metrics.write(chunk_end - 1, stage="eval",
                              heldout_nll_per_dim=nll_dim,
                              heldout_nll_per_graph=nll_graph)
        hit_ckpt = any(s % tcfg.checkpoint_every == 0 and s > 0 for s in steps)
        if os.path.exists(STOP_SENTINEL) and not last:
            save_checkpoint(tcfg.checkpoint_dir, chunk_end,
                            (params, opt_state, ema) if use_ema
                            else (params, opt_state),
                            keep=tcfg.checkpoint_keep)
            if tcfg.git_commit_s > 0:
                commit_run_artifacts(
                    os.path.dirname(tcfg.checkpoint_dir), chunk_end,
                    force=True, label="STOP-sentinel checkpoint")
            print(f"[gnfx] STOP sentinel at step {chunk_end} — checkpointed, "
                  "exiting (resume=1 continues)", flush=True)
            raise SystemExit(3)
        if hit_ckpt or last:
            state = (params, opt_state, ema) if use_ema else (params, opt_state)
            save_checkpoint(tcfg.checkpoint_dir, chunk_end, state,
                            keep=tcfg.checkpoint_keep)
            if tcfg.git_commit_s > 0:
                commit_run_artifacts(
                    os.path.dirname(tcfg.checkpoint_dir), chunk_end,
                    min_interval_s=tcfg.git_commit_s, force=last)
    return ema if use_ema else params
