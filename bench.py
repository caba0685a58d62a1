"""Headline benchmark: GNF training-step throughput on the community-small
config (BASELINE.json metric: "coupling-layer fwd+logdet steps/s/chip").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference is single-device TF1 with no published throughput
(SURVEY.md §6), so the baseline denominator is this build's own
first-measured number (recorded below) — `vs_baseline` > 1 means this
round is faster than round-1's first measurement.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnfx.graph import batch_from_dense
from gnfx.models.flow import FlowConfig, init_flow, log_prob

# Round-1 first measurement on 1× TPU v5e (this build, full train step,
# B=32 N=20 D=14 T=10 H=64 R=3). Fixed denominator for vs_baseline.
BASELINE_STEPS_PER_S = 2090.0


def main():
    cfg = FlowConfig(node_dim=14, num_couplings=10, gnn_hidden=64, gnn_rounds=3)
    params = init_flow(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    bsz, max_n = 32, 20
    rng = np.random.default_rng(0)
    adj = (rng.random((bsz, max_n, max_n)) < 0.3).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(12, max_n + 1, size=bsz).astype(np.int32)
    gb = batch_from_dense(adj, n_node)
    x = jnp.asarray(rng.normal(size=(bsz, max_n, cfg.node_dim)), jnp.float32)
    x = x * gb.node_mask[..., None]

    @jax.jit
    def train_step(params, opt_state, x, gb):
        def loss_fn(p):
            return -jnp.mean(log_prob(p, cfg, x, gb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup / compile
    params, opt_state, loss = train_step(params, opt_state, x, gb)
    loss.block_until_ready()

    n_iters = 200
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = train_step(params, opt_state, x, gb)
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    dispatch_steps_per_s = n_iters / dt

    # chunked dispatch (the production loop, gnfx.train.loop): K full
    # optimizer steps scanned inside one jit call — amortises per-call
    # dispatch latency, which dominates at these shapes
    K = 50
    gb_k = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (K,) + a.shape), gb
    )
    x_k = jnp.broadcast_to(x, (K,) + x.shape)

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

    params, opt_state, loss = train_chunk(params, opt_state, x_k, gb_k)
    loss.block_until_ready()
    n_chunks = 20
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, loss = train_chunk(params, opt_state, x_k, gb_k)
    loss.block_until_ready()
    steps_per_s = n_chunks * K / (time.perf_counter() - t0)

    # secondary: pure fwd+logdet throughput
    lp_fn = jax.jit(lambda p, x, g: log_prob(p, cfg, x, g))
    lp_fn(params, x, gb).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = lp_fn(params, x, gb)
    out.block_until_ready()
    fwd_per_s = n_iters / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "gnf_train_steps_per_s_per_chip",
        "value": round(steps_per_s, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
        "per_dispatch_steps_per_s": round(dispatch_steps_per_s, 2),
        "fwd_logdet_per_s": round(fwd_per_s, 2),
        "config": "community-small B=32 N=20 D=14 T=10 H=64 R=3",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
