"""Coupling-scan unroll probe (on-chip): the trace shows ~3.9k XLA ops per
train step at N=20 — op-dispatch-bound on device, 1.9% MFU. The T-coupling
lax.scan forces a device while-loop with per-iteration overhead and blocks
cross-layer fusion; unrolling it is the classic XLA fix for tiny shapes.
Times the standard scanned chunk vs a fully unrolled one (identical math)
at the bench shape, fetch-synced. Writes runs/unroll_probe.json."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import make_batch, stack_distinct
from gnfx.models.flow import FlowConfig, base_log_prob, coupling_forward, \
    init_flow, log_prob

cfg = FlowConfig(node_dim=14, num_couplings=10, gnn_hidden=64, gnn_rounds=3)
params = init_flow(jax.random.PRNGKey(0), cfg)
tx = optax.adam(1e-3)
opt_state0 = tx.init(params)

rng = np.random.default_rng(0)
K = 50
stacks = [stack_distinct(rng, K, 32, 20, cfg.node_dim) for _ in range(4)]


def unrolled_log_prob(p, x, g):
    couplings = p["couplings"] if (isinstance(p, dict) and "couplings" in p) else p
    ld = jnp.zeros((x.shape[0],), jnp.float32)
    for i in range(cfg.num_couplings):
        layer = jax.tree.map(lambda a: a[i], couplings)
        x, ldi = coupling_forward(layer, cfg, x, g)
        ld = ld + ldi
    return base_log_prob(x, g) + ld


def make_chunk(lp_fn):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, x_k, gb_k):
        def body(carry, inp):
            params, opt_state = carry
            x, gb = inp

            def loss_fn(p):
                return -jnp.mean(lp_fn(p, x, gb))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (x_k, gb_k))
        return params, opt_state, losses[-1]
    return train_chunk


out = {"config": "bench shape B=32 N=20 D=14 T=10 H=64 R=3, K=50"}
for name, lp in (("scanned", lambda p, x, g: log_prob(p, cfg, x, g)),
                 ("unrolled", unrolled_log_prob)):
    chunk = make_chunk(lp)
    p, o = jax.tree.map(jnp.copy, params), tx.init(params)
    t_c = time.perf_counter()
    p, o, loss = chunk(p, o, *stacks[0])
    float(loss)
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 8.0:
        x_k, gb_k = stacks[n % len(stacks)]
        p, o, loss = chunk(p, o, x_k, gb_k)
        n += 1
        float(loss)
    rate = n * K / (time.perf_counter() - t0)
    out[name] = {"steps_per_s": round(rate, 2),
                 "first_call_s": round(compile_s, 1),
                 "final_loss": float(loss)}
    print(f"[unroll] {name}: {out[name]}", flush=True)

out["speedup"] = round(out["unrolled"]["steps_per_s"]
                       / out["scanned"]["steps_per_s"], 3)
print("[unroll]", json.dumps(out), flush=True)
with open("/root/repo/runs/unroll_probe.json", "w") as f:
    json.dump(out, f, indent=2)
