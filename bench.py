"""Headline benchmark: GNF training-step throughput on the community-small
config (BASELINE.json metric: "coupling-layer fwd+logdet steps/s/chip").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference is single-device TF1 with no published throughput
(SURVEY.md §6), so the baseline denominator is this build's own
first-measured number (recorded below) — `vs_baseline` > 1 means this
round is faster than round-1's first measurement.

Honest-measurement rules (round-2 verdict, weak #1 — the round-2 headline
implied ~344 TFLOP/s on a ~197-peak chip):
  * every step in the chunked scan gets a DISTINCT batch (adjacency AND
    features), exactly like the production loop's stacked_repeat_batches;
  * the timing window is sustained (>= MIN_WINDOW_S of wall clock), cycling
    through several pre-staged chunk stacks so no result is a cached replay;
  * FLOPs come from XLA's own cost_analysis of the train step with the
    coupling scan UNROLLED into T explicit layer applications (cost
    analysis counts a lax.scan body ONCE regardless of trip count, so the
    scanned step under-reports by ~T×; the unrolled step is semantically
    identical and counts every coupling);
  * the JSON line carries `tflops_per_s` and `mfu` against the v5e bf16
    peak, plus a `physics_ok` flag that is false whenever the implied
    FLOP/s exceeds the chip peak — a headline that fails this check is an
    artifact, not a result;
  * every sync point FETCHES a scalar to the host (`float(loss)`) instead
    of `block_until_ready`: measured on the axon PJRT relay,
    block_until_ready returns early (57k chunked steps/s -> implied 296
    TFLOP/s on a 197-peak chip even with distinct batches — the while loop
    was enqueueing chunks, not timing them), while a host value fetch is a
    true round-trip. This also matches production semantics: the training
    loop fetches per-step metric arrays once per chunk.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnfx.graph import batch_from_dense
from gnfx.models.flow import (
    FlowConfig, base_log_prob, coupling_forward, init_flow, log_prob,
)

# vs_baseline denominator — RE-ANCHORED round 3. The round-1 number (2090)
# was measured with block_until_ready, which the axon relay acknowledges
# early (see module docstring): it was an enqueue rate, like every bench
# number before round 3. First HONEST measurement (fetch-synced, distinct
# batches, sustained window, physics_ok=true): 716.68 chunked steps/s at
# K=50, 2026-08-19, runs/bench_mfu.json.
BASELINE_STEPS_PER_S = 716.68

# TPU v5e (1 chip): 197 TFLOP/s bf16 / ~98 f32. The bench computes in f32,
# so quoting MFU against the bf16 peak is the conservative choice (true
# f32 MFU is ~2x the printed number); what matters for the physics check
# is that implied FLOP/s must not exceed the bf16 peak.
PEAK_TFLOPS_BF16 = 197.0

MIN_WINDOW_S = 10.0


def make_batch(rng, bsz, max_n, node_dim):
    """One training batch: random ER adjacency + masked gaussian features."""
    adj = (rng.random((bsz, max_n, max_n)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(12, max_n + 1, size=bsz).astype(np.int32)
    gb = batch_from_dense(adj, n_node)
    x = jnp.asarray(rng.normal(size=(bsz, max_n, node_dim)), jnp.float32)
    return x * gb.node_mask[..., None], gb


def stack_distinct(rng, K, bsz, max_n, node_dim):
    """K distinct batches stacked along axis 0 (the production loop's
    stacked_repeat_batches shape: scan consumes one batch per step)."""
    xs, gbs = zip(*[make_batch(rng, bsz, max_n, node_dim) for _ in range(K)])
    x_k = jnp.stack(xs)
    gb_k = jax.tree.map(lambda *a: jnp.stack(a), *gbs)
    return x_k, gb_k


def unrolled_flops_per_step(cfg, tx, params, opt_state, x, gb) -> float:
    """Exact per-step FLOPs from XLA cost analysis of the train step with
    the coupling lax.scan replaced by an unrolled python loop (identical
    math; every one of the T couplings appears in the HLO, so the count
    is the true total rather than one scan body)."""

    def unrolled_log_prob(p, x, g):
        couplings = p["couplings"] if (isinstance(p, dict) and "couplings" in p) else p
        ld = jnp.zeros((x.shape[0],), jnp.float32)
        for i in range(cfg.num_couplings):
            layer = jax.tree.map(lambda a: a[i], couplings)
            x, ldi = coupling_forward(layer, cfg, x, g)
            ld = ld + ldi
        return base_log_prob(x, g) + ld

    @jax.jit
    def step(params, opt_state, x, gb):
        def loss_fn(p):
            return -jnp.mean(unrolled_log_prob(p, x, gb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = step.lower(params, opt_state, x, gb).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def main():
    # scan_unroll=T (full unroll of the coupling stack): measured 1.21x at
    # this shape (runs/unroll_probe.json: 784.9 vs 647.5 steps/s) and 1.6x
    # at the flagship shape (runs/unroll_flagship.json). Identical math —
    # lax.scan unroll is a pure compilation knob; tiny-graph training is
    # op-dispatch-bound ON DEVICE (runs/trace-community) and unrolling lets
    # XLA fuse across couplings instead of re-entering a while loop.
    cfg = FlowConfig(node_dim=14, num_couplings=10, gnn_hidden=64, gnn_rounds=3,
                     scan_unroll=10)
    params = init_flow(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    bsz, max_n = 32, 20
    rng = np.random.default_rng(0)
    x, gb = make_batch(rng, bsz, max_n, cfg.node_dim)

    @jax.jit
    def train_step(params, opt_state, x, gb):
        def loss_fn(p):
            return -jnp.mean(log_prob(p, cfg, x, gb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # FLOPs model (before any timing; uses its own compile)
    flops_per_step = unrolled_flops_per_step(cfg, tx, params, opt_state, x, gb)

    # warmup / compile
    params, opt_state, loss = train_step(params, opt_state, x, gb)
    float(loss)

    # per-dispatch: sustained window, distinct batch per step
    dispatch_batches = [make_batch(rng, bsz, max_n, cfg.node_dim)
                        for _ in range(64)]
    t0 = time.perf_counter()
    n_iters = 0
    while time.perf_counter() - t0 < MIN_WINDOW_S:
        xi, gi = dispatch_batches[n_iters % len(dispatch_batches)]
        params, opt_state, loss = train_step(params, opt_state, xi, gi)
        n_iters += 1
        if n_iters % 200 == 0:
            float(loss)   # true host sync (see module docstring)
    float(loss)
    dispatch_steps_per_s = n_iters / (time.perf_counter() - t0)

    # chunked dispatch (the production loop, gnfx.train.loop): K full
    # optimizer steps scanned inside one jit call — amortises per-call
    # dispatch latency. Several pre-staged stacks of K DISTINCT batches,
    # cycled so consecutive calls never replay the same data.
    K = 50
    stacks = [stack_distinct(rng, K, bsz, max_n, cfg.node_dim)
              for _ in range(4)]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, x_k, gb_k):
        def body(carry, inp):
            params, opt_state = carry
            x, gb = inp

            def loss_fn(p):
                return -jnp.mean(log_prob(p, cfg, x, gb))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (x_k, gb_k)
        )
        return params, opt_state, losses[-1]

    params, opt_state, loss = train_chunk(params, opt_state, *stacks[0])
    float(loss)
    t0 = time.perf_counter()
    n_chunks = 0
    while time.perf_counter() - t0 < MIN_WINDOW_S:
        x_k, gb_k = stacks[n_chunks % len(stacks)]
        params, opt_state, loss = train_chunk(params, opt_state, x_k, gb_k)
        n_chunks += 1
        float(loss)   # one true sync per K steps (production semantics)
    steps_per_s = n_chunks * K / (time.perf_counter() - t0)

    # secondary: pure fwd+logdet throughput (distinct batches, sustained)
    lp_fn = jax.jit(lambda p, x, g: log_prob(p, cfg, x, g))
    float(lp_fn(params, x, gb)[0])
    t0 = time.perf_counter()
    n_fwd = 0
    while time.perf_counter() - t0 < MIN_WINDOW_S / 2:
        xi, gi = dispatch_batches[n_fwd % len(dispatch_batches)]
        out = lp_fn(params, xi, gi)
        n_fwd += 1
        if n_fwd % 200 == 0:
            float(out[0])
    float(out[0])
    fwd_per_s = n_fwd / (time.perf_counter() - t0)

    tflops_per_s = steps_per_s * flops_per_step / 1e12
    mfu = tflops_per_s / PEAK_TFLOPS_BF16
    out = {
        "metric": "gnf_train_steps_per_s_per_chip",
        "value": round(steps_per_s, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
        "per_dispatch_steps_per_s": round(dispatch_steps_per_s, 2),
        "fwd_logdet_per_s": round(fwd_per_s, 2),
        "flops_per_step": flops_per_step,
        "tflops_per_s": round(tflops_per_s, 3),
        "mfu": round(mfu, 4),
        "peak_tflops_bf16": PEAK_TFLOPS_BF16,
        "physics_ok": bool(tflops_per_s <= PEAK_TFLOPS_BF16),
        "config": "community-small B=32 N=20 D=14 T=10 H=64 R=3 unroll=10",
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
