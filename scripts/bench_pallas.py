"""Fused-Pallas vs XLA flow forward at configurable shapes.

Usage:
    python scripts/bench_pallas.py [N=512] [B=8] [iters=20]

The keep-or-retire measurement for `gnfx/ops/pallas_mp.py` (round-1
verdict, What's weak #2): the kernel supports sender-mode f32 forward only,
while every preset ships attention messages — its one chance to matter is
VMEM residency at protein scale (N≈512), where XLA's HBM-materialised
[B, N, H] message tensors dominate traffic. Benches full-flow `log_prob`:

* xla_sender_f32  — the XLA path at the kernel's own configuration
* fused_sender_f32 — the Pallas kernel (same configuration; parity-tested)
* xla_attention_bf16 — the configuration the protein preset actually ships

If fused loses to xla_sender at this shape too, the kernel has no
production niche and is retired with this number as evidence. Appends a
row to runs/pallas_bench.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.config import FlowConfig
from gnfx.graph import batch_from_dense
from gnfx.models.flow import init_flow, log_prob
from gnfx.ops.pallas_mp import log_prob_fused


def _bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main(argv):
    n, b, iters = 512, 8, 20
    for a in argv:
        if a.startswith("N="):
            n = int(a.split("=")[1])
        elif a.startswith("B="):
            b = int(a.split("=")[1])
        elif a.startswith("iters="):
            iters = int(a.split("=")[1])

    # protein-preset architecture (gnfx/config.py): D=14, H=128, R=3, T=12
    base = dict(node_dim=14, num_couplings=12, gnn_hidden=128, gnn_rounds=3)
    rng = np.random.default_rng(0)
    adj = (rng.random((b, n, n)) < (2000.0 / (n * n))).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    n_node = rng.integers(max(2, n // 2), n + 1, size=b).astype(np.int32)
    gb = batch_from_dense(adj, n_node)
    x = jnp.asarray(rng.normal(size=(b, n, base["node_dim"])), jnp.float32)
    x = x * gb.node_mask[..., None]

    row = {"backend": jax.default_backend(), "B": b, "N": n, "iters": iters}
    sender = FlowConfig(**base, message_mode="sender")
    params = init_flow(jax.random.PRNGKey(0), sender)
    lp = jax.jit(lambda p, xx, g: log_prob(p, sender, xx, g))
    row["xla_sender_f32_ms"] = round(_bench(lp, params, x, gb, iters=iters), 3)
    lpf = jax.jit(lambda p, xx, g: log_prob_fused(p, sender, xx, g))
    try:
        row["fused_sender_f32_ms"] = round(
            _bench(lpf, params, x, gb, iters=iters), 3)
    except Exception as e:  # Pallas lowering limits are shape-dependent
        row["fused_sender_f32_error"] = f"{type(e).__name__}: {e}"[:200]

    attn = FlowConfig(**base, message_mode="attention",
                      compute_dtype="bfloat16")
    params_a = init_flow(jax.random.PRNGKey(0), attn)
    lpa = jax.jit(lambda p, xx, g: log_prob(p, attn, xx, g))
    row["xla_attention_bf16_ms"] = round(
        _bench(lpa, params_a, x, gb, iters=iters), 3)

    print("[pallas-bench]", json.dumps(row), flush=True)
    os.makedirs("runs", exist_ok=True)
    path = os.path.join("runs", "pallas_bench.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    return row


if __name__ == "__main__":
    main(sys.argv[1:])
