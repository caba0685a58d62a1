"""GRevNet reversible coupling flow with exact log-det.

Implements SURVEY.md §2.1 #3/#4 (reference coupling layer + flow model) from
the algorithm specification in SURVEY.md §2.3 [arXiv:1905.13177 §3.1]:

    z¹ = x¹ ⊙ exp(s₁(x⁰; G)) + t₁(x⁰; G)        # F1
    z⁰ = x⁰ ⊙ exp(s₂(z¹; G)) + t₂(z¹; G)        # F2
    log|det J| = Σ_nodes Σ_dims [s₁ + s₂]        (masked to real nodes)

with the exact analytic inverse. The s/t functions are message-passing GNNs
(gnfx.ops.gnn) whose output head is zero-initialised, so the flow starts at
the identity. Raw s is soft-clamped with `s = cap·tanh(raw/cap)` for
numerical stability through deep exp chains (standard flow practice; the
inverse recomputes the identical s from the identical inputs, so
invertibility is exact up to float error).

TPU shape: the T couplings run under one `lax.scan` over stacked parameter
pytrees — a single compiled layer body regardless of depth. Everything is a
pure function over the padded `GraphBatch`; padded node slots carry features
of exactly 0 through every layer and contribute exactly 0 to the log-det
(load-bearing for correct NLL — see the autodiff-Jacobian test).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from gnfx.graph import GraphBatch
from gnfx.ops.gnn import GNNConfig, apply_gnn, init_gnn


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    node_dim: int                 # D, must be even; features split into halves
    num_couplings: int = 10       # T
    gnn_hidden: int = 64
    gnn_rounds: int = 3
    aggregation: str = "mean"
    message_mode: str = "sender"
    gnn_global: bool = False      # per-graph global-context channel in s/t GNNs
    s_cap: float = 3.0            # soft clamp on log-scales
    compute_dtype: str = "float32"
    # "affine": z¹ = x¹·exp(s)+t (exact non-zero log-det, density estimation)
    # "additive": z¹ = x¹+t (RevNet-style; log-det 0; stable deep supervised
    #             backbone — activations cannot blow up multiplicatively)
    coupling: str = "affine"
    # data-initialised per-dim affine at the flow input (Glow's ActNorm):
    # standardises the target distribution so couplings start from a
    # well-conditioned base; exact log-det. Params live under
    # params["actnorm"]; couplings under params["couplings"].
    use_actnorm: bool = False
    # LayerNorm on each s/t network's INPUT half. Inside F, so invertibility
    # and the log-det formula are untouched; bounds how activation growth in
    # x feeds back into s/t magnitudes (load-bearing for deep stacks).
    st_input_norm: bool = False

    def __post_init__(self):
        if self.node_dim % 2 != 0:
            raise ValueError("node_dim must be even for half-split couplings")

    @property
    def half_dim(self) -> int:
        return self.node_dim // 2

    def st_gnn_config(self) -> GNNConfig:
        """GNN mapping one half (D/2 dims) to (s, t) for the other half."""
        return GNNConfig(
            in_dim=self.half_dim,
            hidden_dim=self.gnn_hidden,
            out_dim=2 * self.half_dim,
            num_rounds=self.gnn_rounds,
            aggregation=self.aggregation,  # type: ignore[arg-type]
            message_mode=self.message_mode,  # type: ignore[arg-type]
            use_global=self.gnn_global,
            zero_init_out=True,
            compute_dtype=self.compute_dtype,
        )


def init_flow(
    key: jax.Array, cfg: FlowConfig,
    data_mean: jax.Array | None = None,
    data_std: jax.Array | None = None,
) -> dict:
    """Stacked parameters for T couplings: every leaf has leading axis T.

    With `cfg.use_actnorm`, returns {"actnorm": {b, log_s}, "couplings": ...}
    where the actnorm is initialised from the provided per-dim data statistics
    (identity if none given)."""
    gcfg = cfg.st_gnn_config()
    keys = jax.random.split(key, cfg.num_couplings)

    def init_one(k):
        k1, k2 = jax.random.split(k)
        return {"F1": init_gnn(k1, gcfg), "F2": init_gnn(k2, gcfg)}

    per_layer = [init_one(k) for k in keys]
    couplings = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if not cfg.use_actnorm:
        return couplings
    d = cfg.node_dim
    b = jnp.zeros(d) if data_mean is None else jnp.asarray(data_mean, jnp.float32)
    log_s = (jnp.zeros(d) if data_std is None
             else jnp.log(jnp.asarray(data_std, jnp.float32) + 1e-6))
    return {"actnorm": {"b": b, "log_s": log_s}, "couplings": couplings}


def actnorm_forward(an: dict, x: jax.Array, graph: GraphBatch):
    """y = (x − b)·exp(−log_s); log-det = −n_real·Σ log_s per graph."""
    y = (x - an["b"]) * jnp.exp(-an["log_s"]) * graph.node_mask[..., None]
    logdet = -jnp.sum(an["log_s"]) * graph.n_node.astype(jnp.float32)
    return y, logdet


def actnorm_inverse(an: dict, y: jax.Array, graph: GraphBatch):
    x = (y * jnp.exp(an["log_s"]) + an["b"]) * graph.node_mask[..., None]
    logdet = -jnp.sum(an["log_s"]) * graph.n_node.astype(jnp.float32)
    return x, logdet


def _st(params_gnn: dict, cfg: FlowConfig, h: jax.Array, graph: GraphBatch):
    """Run one s/t GNN on a half, returning (s, t), both masked, s clamped.
    In additive mode s is identically 0 (unit scale, zero log-det)."""
    if cfg.st_input_norm:
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        h = h * graph.node_mask[..., None]
    out = apply_gnn(params_gnn, cfg.st_gnn_config(), h, graph)
    s_raw, t = jnp.split(out, 2, axis=-1)
    if cfg.coupling == "additive":
        s = jnp.zeros_like(s_raw)
    else:
        s = cfg.s_cap * jnp.tanh(s_raw / cfg.s_cap)
    return s, t


def _masked_sum(x: jax.Array, graph: GraphBatch) -> jax.Array:
    """Σ over node slots and feature dims, masked to real nodes -> f32[B]."""
    return jnp.sum(x * graph.node_mask[..., None], axis=(1, 2))


def coupling_forward(
    layer_params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """One GRevNet coupling step. x f32[B,N,D] -> (z, logdet[B])."""
    x0, x1 = jnp.split(x, 2, axis=-1)
    with jax.named_scope("coupling_F1"):
        s1, t1 = _st(layer_params["F1"], cfg, x0, graph)
    z1 = x1 * jnp.exp(s1) + t1
    with jax.named_scope("coupling_F2"):
        s2, t2 = _st(layer_params["F2"], cfg, z1, graph)
    z0 = x0 * jnp.exp(s2) + t2
    z = jnp.concatenate([z0, z1], axis=-1) * graph.node_mask[..., None]
    logdet = _masked_sum(s1, graph) + _masked_sum(s2, graph)
    return z, logdet


def coupling_inverse(
    layer_params: dict, cfg: FlowConfig, z: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """Exact inverse of `coupling_forward`. Returns (x, logdet of forward)."""
    z0, z1 = jnp.split(z, 2, axis=-1)
    s2, t2 = _st(layer_params["F2"], cfg, z1, graph)
    x0 = (z0 - t2) * jnp.exp(-s2)
    s1, t1 = _st(layer_params["F1"], cfg, x0, graph)
    x1 = (z1 - t1) * jnp.exp(-s1)
    x = jnp.concatenate([x0, x1], axis=-1) * graph.node_mask[..., None]
    logdet = _masked_sum(s1, graph) + _masked_sum(s2, graph)
    return x, logdet


def flow_forward(
    params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """z = f_T ∘ … ∘ f_1(x) and total log|det J| per graph, via one scan.
    An optional actnorm (params["actnorm"]) standardises x first."""
    ld0 = jnp.zeros((x.shape[0],), jnp.float32)
    couplings = params
    if isinstance(params, dict) and "couplings" in params:
        x, ld0 = actnorm_forward(params["actnorm"], x, graph)
        couplings = params["couplings"]

    def body(carry, layer_params):
        h, ld = carry
        z, ldi = coupling_forward(layer_params, cfg, h, graph)
        return (z, ld + ldi), None

    (z, logdet), _ = jax.lax.scan(body, (x, ld0), couplings)
    return z, logdet


def flow_inverse(
    params: dict, cfg: FlowConfig, z: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """x = f_1⁻¹ ∘ … ∘ f_T⁻¹(z); scan runs the stacked layers in reverse."""
    couplings = params
    an = None
    if isinstance(params, dict) and "couplings" in params:
        an = params["actnorm"]
        couplings = params["couplings"]

    def body(carry, layer_params):
        h, ld = carry
        x, ldi = coupling_inverse(layer_params, cfg, h, graph)
        return (x, ld + ldi), None

    init = (z, jnp.zeros((z.shape[0],), jnp.float32))
    (x, logdet), _ = jax.lax.scan(body, init, couplings, reverse=True)
    if an is not None:
        x, ld_an = actnorm_inverse(an, x, graph)
        logdet = logdet + ld_an
    return x, logdet


_LOG_2PI = math.log(2.0 * math.pi)


def base_log_prob(z: jax.Array, graph: GraphBatch) -> jax.Array:
    """Standard-normal log-density over real node dims, per graph -> f32[B]."""
    per_dim = -0.5 * (z * z + _LOG_2PI)
    return jnp.sum(per_dim * graph.node_mask[..., None], axis=(1, 2))


def log_prob(
    params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch
) -> jax.Array:
    """Exact log p(x | G) per graph via change of variables -> f32[B]."""
    z, logdet = flow_forward(params, cfg, x, graph)
    return base_log_prob(z, graph) + logdet


def nll_bits_per_dim(logp: jax.Array, graph: GraphBatch) -> jax.Array:
    """Negative log-likelihood in bits per real feature dimension, per graph."""
    dims = jnp.maximum(graph.n_node.astype(jnp.float32) * graph.node_dim, 1.0)
    return -logp / (dims * math.log(2.0))


def sample_latents(key: jax.Array, graph: GraphBatch) -> jax.Array:
    """z ~ N(0, I) on real node slots, zero on padding."""
    z = jax.random.normal(key, graph.nodes.shape, jnp.float32)
    return z * graph.node_mask[..., None]
