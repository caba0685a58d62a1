"""Flagship-shape coupling-scan unroll A/B — regenerate the lost artifact.

The scan_unroll=12 preset default cites runs/unroll_flagship.json (557 vs
348 device steps/s, 1.6x — gnfx/config.py:144), but that file was written
after the round-4 commit that quoted it and the sixth reimage ate it: the
claim currently has no artifact. This re-measures the SHIPPED knob
(FlowConfig.scan_unroll 1 vs 12, identical math, log_prob production path)
at the flagship shape (B=32 N=20 D=20 T=12 H=128 R=3 attention+ActNorm),
fetch-synced over sustained >=8 s windows, and commits the JSON in-job.
"""
import dataclasses
import functools
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import stack_distinct
from gnfx.models.flow import FlowConfig, init_flow, log_prob

BASE = FlowConfig(node_dim=20, num_couplings=12, gnn_hidden=128,
                  gnn_rounds=3, message_mode="attention", use_actnorm=True,
                  scan_unroll=1)
params = init_flow(jax.random.PRNGKey(0), BASE)
tx = optax.adam(1e-3)

rng = np.random.default_rng(0)
K = 50
stacks = [stack_distinct(rng, K, 32, 20, BASE.node_dim) for _ in range(4)]

out = {"config": "flagship shape B=32 N=20 D=20 T=12 H=128 R=3 "
                 "attention+actnorm, K=50, production log_prob path"}
for name, unroll in (("scan_unroll=1", 1), ("scan_unroll=12", 12)):
    cfg = dataclasses.replace(BASE, scan_unroll=unroll)

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
            body, (params, opt_state), (x_k, gb_k))
        return params, opt_state, losses[-1]

    p, o = jax.tree.map(jnp.copy, params), tx.init(params)
    t_c = time.perf_counter()
    p, o, loss = train_chunk(p, o, *stacks[0])
    float(loss)  # host fetch = true device sync (relay block_until_ready lies)
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 8.0:
        x_k, gb_k = stacks[n % len(stacks)]
        p, o, loss = train_chunk(p, o, x_k, gb_k)
        n += 1
        float(loss)
    rate = n * K / (time.perf_counter() - t0)
    out[name] = {"steps_per_s": round(rate, 2),
                 "first_call_s": round(compile_s, 1),
                 "final_loss": float(loss)}
    print(f"[107] {name}: {rate:.1f} steps/s (compile {compile_s:.1f}s)",
          flush=True)

out["speedup"] = round(out["scan_unroll=12"]["steps_per_s"]
                       / out["scan_unroll=1"]["steps_per_s"], 3)
with open("/root/repo/runs/unroll_flagship.json", "w") as f:
    json.dump(out, f, indent=2)
print("[107]", json.dumps(out), flush=True)
subprocess.run(["git", "-C", "/root/repo", "add", "-f",
                "runs/unroll_flagship.json"], check=False)
subprocess.run(["git", "-C", "/root/repo", "commit", "-q", "--no-verify",
                "-m", "unroll_flagship.json: regenerated flagship-shape "
                "unroll A/B artifact"], check=False)
