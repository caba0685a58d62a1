"""Supervised GRevNet: the coupling stack as an invertible GNN backbone for
node classification (SURVEY.md §2.1 #7, §3e; BASELINE config 3).

    h = W_in · features        (linear projection to the backbone width)
    z = f_T ∘ … ∘ f_1(h; G)    (GRevNet couplings over the TRUE adjacency,
                                O(1) activation memory via the reversible
                                backward — gnfx.models.reversible)
    logits = W_head · z
    loss  = masked cross-entropy on the train split

A plain message-passing GNN with the same budget (`init_gnn_baseline`)
provides the paper's parity comparison (GRevNet ≈ GNN within ~1 pt,
SURVEY.md §6) in-framework.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnfx.data.citation import CitationGraph
from gnfx.graph import GraphBatch, batch_from_dense
from gnfx.models.flow import FlowConfig, init_flow, flow_forward
from gnfx.models.reversible import flow_forward_rev
from gnfx.ops.gnn import GNNConfig, apply_gnn, init_gnn
from gnfx.ops.mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class SupervisedConfig:
    num_features: int
    num_classes: int
    node_dim: int = 32            # backbone width (even)
    num_couplings: int = 6
    gnn_hidden: int = 64
    gnn_rounds: int = 1           # per-coupling MP rounds
    lr: float = 5e-3
    weight_decay: float = 5e-4
    num_steps: int = 300
    reversible: bool = True       # O(1)-memory backward
    seed: int = 0

    def flow_config(self) -> FlowConfig:
        # additive couplings + s/t input norm: a deep invertible backbone
        # whose activations cannot blow up multiplicatively (class-loss
        # pressure on logits made the affine version diverge)
        return FlowConfig(
            node_dim=self.node_dim, num_couplings=self.num_couplings,
            gnn_hidden=self.gnn_hidden, gnn_rounds=self.gnn_rounds,
            coupling="additive", st_input_norm=True,
        )


def citation_to_batch(g: CitationGraph, pad_to: int = 128) -> Tuple[GraphBatch, jax.Array, dict]:
    """One citation graph -> B=1 GraphBatch padded to a multiple of
    `pad_to` node slots (MXU-aligned), plus labels and split masks."""
    n = g.num_nodes
    n_pad = ((n + pad_to - 1) // pad_to) * pad_to
    adj = np.zeros((1, n_pad, n_pad), np.float32)
    adj[0, :n, :n] = g.adj
    feats = np.zeros((1, n_pad, g.features.shape[1]), np.float32)
    feats[0, :n] = g.features
    gb = batch_from_dense(adj, np.array([n], np.int32), feats)
    labels = np.zeros((n_pad,), np.int32)
    labels[:n] = g.labels
    masks = {}
    for name, m in (("train", g.train_mask), ("val", g.val_mask),
                    ("test", g.test_mask)):
        mm = np.zeros((n_pad,), np.float32)
        mm[:n] = m.astype(np.float32)
        masks[name] = jnp.asarray(mm)
    return gb, jnp.asarray(labels), masks


def init_supervised(key: jax.Array, cfg: SupervisedConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "input": init_mlp(k1, [cfg.num_features, cfg.node_dim]),
        "flow": init_flow(k2, cfg.flow_config()),
        "head": init_mlp(k3, [cfg.node_dim, cfg.num_classes]),
    }


def forward(params: dict, cfg: SupervisedConfig, graph: GraphBatch) -> jax.Array:
    """Node logits f32[B, N, C]."""
    h = apply_mlp(params["input"], graph.nodes) * graph.node_mask[..., None]
    if cfg.reversible:
        z = flow_forward_rev(params["flow"], cfg.flow_config(), h, graph)
    else:
        z, _ = flow_forward(params["flow"], cfg.flow_config(), h, graph)
    return apply_mlp(params["head"], z)


def masked_ce(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits[0], axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits[0], axis=-1)
    return jnp.sum((pred == labels) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def train_supervised(
    cfg: SupervisedConfig, graph: GraphBatch, labels: jax.Array, masks: dict,
    *, log_every: int = 50, metrics=None,
) -> Tuple[dict, dict]:
    """Full-graph training; returns (params, final metrics)."""
    params = init_supervised(jax.random.PRNGKey(cfg.seed), cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
    )
    opt_state = tx.init(params)

    # graph/labels/masks are jit ARGUMENTS, not closures: closing over a
    # full-size citation graph bakes it into the executable as a constant
    # (a Pubmed-scale adjacency made the compile payload exceed the remote
    # compiler's request limit)
    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
    def step(params, opt_state, graph, labels, train_mask):
        def loss_fn(p):
            logits = forward(p, cfg, graph)
            return masked_ce(logits, labels, train_mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    for i in range(cfg.num_steps):
        params, opt_state, loss, logits = step(params, opt_state, graph,
                                               labels, masks["train"])
        if i % 50 == 0:
            loss.block_until_ready()  # bound the dispatch queue
        if metrics is not None and (i % log_every == 0 or i == cfg.num_steps - 1):
            metrics.write(i, stage="supervised", ce=loss,
                          val_acc=accuracy(logits, labels, masks["val"]))

    logits = jax.jit(forward, static_argnums=(1,))(params, cfg, graph)
    final = {
        "train_acc": float(accuracy(logits, labels, masks["train"])),
        "val_acc": float(accuracy(logits, labels, masks["val"])),
        "test_acc": float(accuracy(logits, labels, masks["test"])),
    }
    return params, final


# ---------------------------------------------------------------------------
# plain-GNN parity baseline
# ---------------------------------------------------------------------------

def train_gnn_baseline(
    cfg: SupervisedConfig, graph: GraphBatch, labels: jax.Array, masks: dict,
) -> dict:
    """Same-budget non-invertible GNN for the paper's parity comparison."""
    gcfg = GNNConfig(
        in_dim=cfg.num_features, hidden_dim=cfg.gnn_hidden,
        out_dim=cfg.num_classes,
        num_rounds=max(2, cfg.num_couplings * cfg.gnn_rounds // 2),
    )
    params = init_gnn(jax.random.PRNGKey(cfg.seed + 1), gcfg)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
    )
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph, labels, train_mask):
        def loss_fn(p):
            logits = apply_gnn(p, gcfg, graph.nodes, graph)
            return masked_ce(logits, labels, train_mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    for i in range(cfg.num_steps):
        params, opt_state, loss, logits = step(params, opt_state, graph,
                                               labels, masks["train"])
        if i % 50 == 0:
            loss.block_until_ready()
    logits = jax.jit(
        lambda p, g: apply_gnn(p, gcfg, g.nodes, g)
    )(params, graph)
    return {
        "test_acc": float(accuracy(logits, labels, masks["test"])),
        "val_acc": float(accuracy(logits, labels, masks["val"])),
    }
