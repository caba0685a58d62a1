"""Fused message-passing + coupling Pallas TPU kernel (SURVEY.md §7 phase 6).

One `pallas_call` per coupling layer runs the ENTIRE GRevNet step for one
graph per grid program — both s/t GNNs (embed, R message-passing rounds,
output head), the affine update, and the log-det reduction — with every
intermediate resident in VMEM. The XLA path materialises the [B, N, H]
message/aggregate tensors in HBM between the many small matmuls of a
coupling; at protein scale (N≈512) this kernel keeps the whole working set
(~2 MB/graph: h, msgs, agg, adj) on-chip, so HBM traffic per coupling drops
to the input/output node features plus one adjacency read.

Scope: forward/log-det path (sampling, IWAE eval, and the fwd half of
training). Supports the default architecture (sender messages, mean
aggregation, msg_layers=2, upd_layers=2, residual). The XLA path remains
the reference; parity is asserted in interpret-mode tests, and `bench.py`
decides which path wins per shape (SURVEY.md §7: "measure, don't assume").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnfx.graph import GraphBatch
from gnfx.models.flow import FlowConfig


def _flatten_gnn_params(p: dict) -> list:
    """Deterministic flat order: embed w,b | per round (msg w0,b0,w1,b1,
    upd w0,b0,w1,b1) | out w,b. Biases are reshaped to [1, H]: TPU Pallas
    requires the last two block dims to divide (8, 128) or equal the array
    dims, which a 1-D bias violates."""

    def b2d(b):
        return b.reshape(1, -1)

    flat = [p["embed"]["w"][0], b2d(p["embed"]["b"][0])]
    for rnd in p["rounds"]:
        flat += [rnd["msg"]["w"][0], b2d(rnd["msg"]["b"][0]),
                 rnd["msg"]["w"][1], b2d(rnd["msg"]["b"][1])]
        flat += [rnd["upd"]["w"][0], b2d(rnd["upd"]["b"][0]),
                 rnd["upd"]["w"][1], b2d(rnd["upd"]["b"][1])]
    flat += [p["out"]["w"][0], b2d(p["out"]["b"][0])]
    return flat


def _gnn_in_kernel(h_in, adj, mask, deg_inv, params, num_rounds):
    """The s/t GNN, VMEM-resident. h_in [N, half] -> [N, 2*half]."""
    idx = 0

    def take(n):
        nonlocal idx
        out = params[idx : idx + n]
        idx += n
        return out

    we, be = take(2)
    h = jnp.dot(h_in, we[:], preferred_element_type=jnp.float32) + be[:]
    h = h * mask
    for _ in range(num_rounds):
        mw0, mb0, mw1, mb1, uw0, ub0, uw1, ub1 = take(8)
        a = jax.nn.relu(h)
        m = jax.nn.relu(
            jnp.dot(a, mw0[:], preferred_element_type=jnp.float32) + mb0[:]
        )
        m = jnp.dot(m, mw1[:], preferred_element_type=jnp.float32) + mb1[:]
        m = m * mask
        # agg[v] = Σ_u adj[u, v] · m[u]  — contract over senders on the MXU
        agg = jax.lax.dot_general(
            adj, m, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        agg = agg * deg_inv
        u_in = jnp.concatenate([h, agg], axis=-1)
        out = jax.nn.relu(
            jnp.dot(u_in, uw0[:], preferred_element_type=jnp.float32) + ub0[:]
        )
        out = jnp.dot(out, uw1[:], preferred_element_type=jnp.float32) + ub1[:]
        h = (h + out) * mask
    wo, bo = take(2)
    o = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[:]
    return o * mask


def _coupling_kernel(cfg: FlowConfig, n_f1: int, x_ref, adj_ref, mask_ref,
                     *rest):
    # rest = [f1 params..., f2 params..., z_out, logdet_out]
    f1_params = rest[:n_f1]
    f2_params = rest[n_f1 : 2 * n_f1]
    z_ref, ld_ref = rest[2 * n_f1], rest[2 * n_f1 + 1]

    half = cfg.half_dim
    x = x_ref[0]                     # [N, D]
    adj = adj_ref[0]                 # [N, N]
    mask = mask_ref[0]               # [N, 1] (mask passed as [B, N, 1])
    deg = jnp.sum(adj, axis=0)[:, None]          # in-degree (receivers)
    if cfg.aggregation == "mean":
        deg_inv = 1.0 / jnp.maximum(deg, 1.0)
    else:
        deg_inv = jnp.ones_like(deg)

    def st(params_flat, h):
        o = _gnn_in_kernel(h, adj, mask, deg_inv, params_flat, cfg.gnn_rounds)
        s_raw, t = o[:, :half], o[:, half:]
        s = cfg.s_cap * jnp.tanh(s_raw / cfg.s_cap)
        return s, t

    x0, x1 = x[:, :half], x[:, half:]
    s1, t1 = st(f1_params, x0)
    z1 = (x1 * jnp.exp(s1) + t1) * mask
    s2, t2 = st(f2_params, z1)
    z0 = (x0 * jnp.exp(s2) + t2) * mask
    z_ref[0] = jnp.concatenate([z0, z1], axis=-1)
    # scalar log-det broadcast across one full (8, 128) VMEM tile — the
    # smallest f32 block shape TPU lowering accepts; caller reads [0, 0]
    ld_ref[0] = jnp.full((8, 128), jnp.sum((s1 + s2) * mask), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_coupling_forward(
    layer_params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch,
    *, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One GRevNet coupling via the fused kernel. Returns (z, logdet[B])."""
    if cfg.message_mode != "sender":
        raise NotImplementedError("fused kernel supports sender messages")
    bsz, max_n, d = x.shape
    f1 = _flatten_gnn_params(layer_params["F1"])
    f2 = _flatten_gnn_params(layer_params["F2"])
    n_f1 = len(f1)

    def param_spec(p):
        # replicated across the graph grid
        return pl.BlockSpec(p.shape, lambda b: (0,) * p.ndim,
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, max_n, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_n, max_n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_n, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *[param_spec(p) for p in f1],
            *[param_spec(p) for p in f2],
        ],
        out_specs=[
            pl.BlockSpec((1, max_n, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    z, ld = pl.pallas_call(
        functools.partial(_coupling_kernel, cfg, n_f1),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, max_n, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x, graph.adj, graph.node_mask[..., None], *f1, *f2)
    return z, ld[:, 0, 0]


def flow_forward_fused(
    params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch,
    *, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full flow forward via the fused kernel (scan over stacked layers)."""

    ld0 = jnp.zeros((x.shape[0],), jnp.float32)
    couplings = params
    if isinstance(params, dict) and "couplings" in params:
        from gnfx.models.flow import actnorm_forward

        x, ld0 = actnorm_forward(params["actnorm"], x, graph)
        couplings = params["couplings"]

    def body(carry, layer_params):
        h, ld = carry
        z, ldi = fused_coupling_forward(layer_params, cfg, h, graph,
                                        interpret=interpret)
        return (z, ld + ldi), None

    (z, logdet), _ = jax.lax.scan(body, (x, ld0), couplings)
    return z, logdet


def log_prob_fused(
    params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch,
    *, interpret: bool = False,
) -> jax.Array:
    from gnfx.models.flow import base_log_prob

    z, logdet = flow_forward_fused(params, cfg, x, graph, interpret=interpret)
    return base_log_prob(z, graph) + logdet
