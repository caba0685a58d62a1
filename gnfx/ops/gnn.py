"""Masked dense message passing (the framework's GNN).

Covers SURVEY.md §2.1 #2 (the reference's `graph_nets.blocks` + sonnet MLP
message-passing stack) with a TPU-first realization: messages aggregate via a
batched `einsum` against the dense masked adjacency — one big MXU contraction
per round instead of gather/segment-sum — and every shape is static.

One message-passing round, update rule (SURVEY.md §2.3):

    m_v   = agg_{u in N(v)} M(h_u [, h_v])        (sum or mean aggregation)
    h_v' <- U([h_v, m_v])   (+ residual)

Two message modes:
  * ``sender``   — M depends on the sender only: msgs = MLP(h); aggregation is
                   `einsum('buv,buh->bvh', adj, msgs)`. O(B·N²·H) matmul,
                   MXU-shaped. Default.
  * ``pairwise`` — M depends on (sender, receiver): first layer computed as a
                   broadcast sum of two projections (never materialising the
                   concat), then aggregated. O(B·N²·H) memory — fine for the
                   small/medium graphs of every BASELINE config; for node
                   counts beyond one device see the ring node-sharded path
                   (gnfx/parallel/node_sharded.py).

A segment-sum aggregation oracle is provided for tests only (SURVEY.md §4.1
"masked-MP equivalence").
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from gnfx.graph import GraphBatch
from gnfx.ops.mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class GNNConfig:
    in_dim: int
    hidden_dim: int
    out_dim: int
    num_rounds: int = 3
    aggregation: Literal["mean", "sum"] = "mean"
    message_mode: Literal["sender", "pairwise", "attention"] = "sender"
    attn_dim: int = 32           # q/k width for attention messages
    # concat a per-graph global context (masked mean of h) into every node
    # update — the graph_nets "globals" channel (SURVEY.md §2.1 #2). Gives
    # generation-time flows a coordination channel for global structure
    # (e.g. how many clusters a graph has), which purely local messages
    # cannot express over the fully-connected graph.
    use_global: bool = False
    msg_layers: int = 2          # depth of the message MLP (sender mode)
    upd_layers: int = 2          # depth of the update MLP
    residual: bool = True
    zero_init_out: bool = False  # zero final head: GNN starts as the zero map
    compute_dtype: str = "float32"  # "bfloat16" to run MP matmuls on the MXU in bf16


def init_gnn(key: jax.Array, cfg: GNNConfig) -> dict:
    k_embed, k_out, *k_rounds = jax.random.split(key, 2 + cfg.num_rounds)
    H = cfg.hidden_dim
    rounds = []
    for kr in k_rounds:
        km, ku = jax.random.split(kr)
        if cfg.message_mode == "sender":
            msg = init_mlp(km, [H] * cfg.msg_layers + [H])
        elif cfg.message_mode == "attention":
            k1, k2, k3 = jax.random.split(km, 3)
            msg = {
                "mlp": init_mlp(k1, [H] * cfg.msg_layers + [H]),
                "wq": init_mlp(k2, [H, cfg.attn_dim])["w"][0],
                "wk": init_mlp(k3, [H, cfg.attn_dim])["w"][0],
            }
        else:
            k1, k2 = jax.random.split(km)
            # first pairwise layer: W_send, W_recv, bias; then a tail MLP
            msg = {
                "w_send": init_mlp(k1, [H, H])["w"][0],
                "w_recv": init_mlp(k2, [H, H])["w"][0],
                "b": jnp.zeros((H,), jnp.float32),
            }
        upd_in = (3 if cfg.use_global else 2) * H
        upd = init_mlp(ku, [upd_in] + [H] * (cfg.upd_layers - 1) + [H])
        rounds.append({"msg": msg, "upd": upd})
    return {
        "embed": init_mlp(k_embed, [cfg.in_dim, H]),
        "rounds": rounds,
        "out": init_mlp(k_out, [H, cfg.out_dim], final_zeros=cfg.zero_init_out),
    }


def _normalizer(graph: GraphBatch, cfg: GNNConfig) -> jax.Array:
    """f32[B, N, 1] divisor for aggregated messages at each receiver."""
    if cfg.aggregation == "sum":
        return jnp.ones((graph.batch_size, graph.max_nodes, 1), jnp.float32)
    deg_in = jnp.sum(graph.adj, axis=1)  # receivers index axis -1 of adj
    return jnp.maximum(deg_in, 1.0)[..., None]


def aggregate_dense(adj: jax.Array, msgs: jax.Array) -> jax.Array:
    """agg[b, v] = sum_u adj[b, u, v] * msgs[b, u]  — one MXU contraction."""
    return jnp.einsum(
        "buv,buh->bvh", adj, msgs, preferred_element_type=jnp.float32
    )


def aggregate_segment(
    senders: jax.Array, receivers: jax.Array, msgs: jax.Array, num_nodes: int
) -> jax.Array:
    """Sparse segment-sum oracle over an edge list (single graph, test-only).

    msgs: f32[num_nodes, H]; result[v] = sum over edges (u->v) of msgs[u].
    """
    edge_msgs = msgs[senders]
    return jax.ops.segment_sum(edge_msgs, receivers, num_segments=num_nodes)


def apply_gnn(params: dict, cfg: GNNConfig, x: jax.Array, graph: GraphBatch) -> jax.Array:
    """Run the GNN on node features x (f32[B, N, in_dim]) over graph.adj.

    Output f32[B, N, out_dim], exactly zero on padded node slots when the
    output head is zero-initialised or by final masking (always applied).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    mask = graph.node_mask[..., None]
    if cfg.message_mode == "attention":
        norm = 1.0  # attention weights already sum to 1 per receiver
    else:
        norm = _normalizer(graph, cfg)
    adj = graph.adj

    with jax.named_scope("gnn_embed"):
        h = apply_mlp(params["embed"], x * mask, compute_dtype=dtype)
        h = h * mask
    for rnd in params["rounds"]:
        if cfg.message_mode == "sender":
            msgs = apply_mlp(rnd["msg"], jax.nn.relu(h), compute_dtype=dtype)
            msgs = msgs * mask  # padded senders contribute nothing
            agg = aggregate_dense(adj.astype(dtype), msgs.astype(dtype))
        elif cfg.message_mode == "attention":
            # receivers attend over their in-neighbors: nodes aggregate from
            # FEATURE-SPACE-RELEVANT senders rather than a flat mean — the
            # load-bearing inductive bias for flows over fully-connected
            # generation graphs, where mean aggregation collapses to one
            # global average and hides which nodes are close.
            hr = jax.nn.relu(h)
            msgs = apply_mlp(rnd["msg"]["mlp"], hr, compute_dtype=dtype) * mask
            q = jnp.dot(hr.astype(dtype), rnd["msg"]["wq"].astype(dtype),
                        preferred_element_type=jnp.float32)
            kk = jnp.dot(hr.astype(dtype), rnd["msg"]["wk"].astype(dtype),
                         preferred_element_type=jnp.float32)
            logits = jnp.einsum("bvk,buk->bvu", q, kk,
                                preferred_element_type=jnp.float32)
            logits = logits / (cfg.attn_dim ** 0.5)
            # adj[u, v]: edge u->v; receiver v attends over senders u
            allowed = jnp.transpose(adj, (0, 2, 1)) > 0.5
            logits = jnp.where(allowed, logits, -1e9)
            att = jax.nn.softmax(logits, axis=-1)
            # isolated/padded receivers: all -1e9 -> uniform junk; zero them
            att = att * allowed.any(axis=-1, keepdims=True)
            agg = jnp.einsum("bvu,buh->bvh", att.astype(dtype),
                             msgs.astype(dtype),
                             preferred_element_type=jnp.float32)
        else:
            hm = jax.nn.relu(h) * mask
            pre_s = jnp.dot(
                hm.astype(dtype), rnd["msg"]["w_send"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            pre_r = jnp.dot(
                hm.astype(dtype), rnd["msg"]["w_recv"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            # m[b, u, v, :] = relu(pre_s[b, u] + pre_r[b, v] + b)
            m = jax.nn.relu(
                pre_s[:, :, None, :] + pre_r[:, None, :, :] + rnd["msg"]["b"]
            )
            agg = jnp.einsum(
                "buv,buvh->bvh", adj.astype(dtype), m.astype(dtype),
                preferred_element_type=jnp.float32,
            )
        agg = agg / norm
        if cfg.use_global:
            denom = jnp.maximum(
                jnp.sum(graph.node_mask, axis=1, keepdims=True), 1.0
            )[..., None]
            gctx = jnp.sum(h * mask, axis=1, keepdims=True) / denom
            gctx = jnp.broadcast_to(gctx, h.shape)
            upd_in = jnp.concatenate([h, agg, gctx], axis=-1)
        else:
            upd_in = jnp.concatenate([h, agg], axis=-1)
        out = apply_mlp(rnd["upd"], upd_in, compute_dtype=dtype)
        h = (h + out) if cfg.residual else out
        h = h * mask
    y = apply_mlp(params["out"], h, compute_dtype=dtype)
    return y * mask
