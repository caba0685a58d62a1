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
    # "rqs": monotone rational-quadratic spline per dim (Neural Spline Flows,
    #        arXiv:1906.04032 — PAPERS.md) parameterised by the same GNN;
    #        far more expressive per coupling than affine for multimodal
    #        fine structure, exact log-det and analytic inverse. Identity
    #        outside [-rqs_range, rqs_range]; zero GNN output = identity map
    #        (so zero-init start and padded-node exactness carry over).
    coupling: str = "affine"
    rqs_bins: int = 8             # K spline bins ("rqs" coupling only)
    rqs_range: float = 4.0        # spline support [-B, B] ("rqs" only)
    # data-initialised per-dim affine at the flow input (Glow's ActNorm):
    # standardises the target distribution so couplings start from a
    # well-conditioned base; exact log-det. Params live under
    # params["actnorm"]; couplings under params["couplings"].
    use_actnorm: bool = False
    # LayerNorm on each s/t network's INPUT half. Inside F, so invertibility
    # and the log-det formula are untouched; bounds how activation growth in
    # x feeds back into s/t magnitudes (load-bearing for deep stacks).
    st_input_norm: bool = False
    # lax.scan unroll factor for the coupling stack (pure perf, identical
    # math). Tiny-graph training is op-dispatch-bound on device (~3.9k XLA
    # ops/step, runs/trace-community/trace_summary.json); unrolling removes
    # per-iteration while-loop overhead and lets XLA fuse across couplings,
    # at the cost of compile time. Must divide num_couplings (lax.scan
    # requirement is only that it's a positive int; partial unroll is fine).
    scan_unroll: int = 1

    def __post_init__(self):
        if self.node_dim % 2 != 0:
            raise ValueError("node_dim must be even for half-split couplings")

    @property
    def half_dim(self) -> int:
        return self.node_dim // 2

    def st_gnn_config(self) -> GNNConfig:
        """GNN mapping one half (D/2 dims) to the transform parameters of the
        other half: (s, t) for affine/additive, 3K−1 spline params/dim for
        rqs."""
        per_dim = (3 * self.rqs_bins - 1) if self.coupling == "rqs" else 2
        return GNNConfig(
            in_dim=self.half_dim,
            hidden_dim=self.gnn_hidden,
            out_dim=per_dim * self.half_dim,
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


def _masked_sum(x: jax.Array, graph: GraphBatch) -> jax.Array:
    """Σ over node slots and feature dims, masked to real nodes -> f32[B]."""
    return jnp.sum(x * graph.node_mask[..., None], axis=(1, 2))


# ---------------------------------------------------------------------------
# Monotone rational-quadratic splines (Durkan et al., arXiv:1906.04032)
# ---------------------------------------------------------------------------

_MIN_BIN = 1e-3
_MIN_DERIV = 1e-3
# _MIN_DERIV + softplus(x + _DERIV_SHIFT) == 1 exactly at x == 0: zero
# spline params -> unit knot derivatives -> (with uniform bins) the
# identity transform
_DERIV_SHIFT = math.log(math.expm1(1.0 - _MIN_DERIV))
# soft cap on the raw spline logits (tanh squash, like s_cap for affine
# couplings): bounds adjacent-bin width/height/derivative ratios so the
# quadratic inverse stays float32-well-conditioned for ANY GNN output
_LOGIT_CAP = 2.5


def _rqs(x: jax.Array, theta: jax.Array, K: int, B: float, inverse: bool):
    """Elementwise monotone RQS on [-B, B], identity (slope 1) outside.

    x: f32[...]; theta: f32[..., 3K-1] raw parameters (K widths, K heights,
    K-1 internal knot derivatives; boundary derivatives fixed to 1 so the
    spline meets the identity tails C¹-continuously). Returns
    (y, log|dy/dx|) elementwise; `inverse=True` evaluates the analytic
    inverse and returns the FORWARD log-derivative at the recovered point.
    All-zero theta is exactly the identity with zero log-derivative.
    """
    w_raw = _LOGIT_CAP * jnp.tanh(theta[..., :K] / _LOGIT_CAP)
    h_raw = _LOGIT_CAP * jnp.tanh(theta[..., K : 2 * K] / _LOGIT_CAP)
    d_raw = _LOGIT_CAP * jnp.tanh(theta[..., 2 * K :] / _LOGIT_CAP)

    widths = _MIN_BIN + (1.0 - _MIN_BIN * K) * jax.nn.softmax(w_raw, axis=-1)
    heights = _MIN_BIN + (1.0 - _MIN_BIN * K) * jax.nn.softmax(h_raw, axis=-1)
    widths = widths * (2.0 * B)
    heights = heights * (2.0 * B)
    xk = jnp.cumsum(widths, axis=-1) - B                   # right knot x, [.., K]
    xk = jnp.concatenate([jnp.full_like(xk[..., :1], -B), xk], axis=-1)
    yk = jnp.cumsum(heights, axis=-1) - B
    yk = jnp.concatenate([jnp.full_like(yk[..., :1], -B), yk], axis=-1)
    derivs = _MIN_DERIV + jax.nn.softplus(d_raw + _DERIV_SHIFT)
    ones = jnp.ones_like(derivs[..., :1])
    derivs = jnp.concatenate([ones, derivs, ones], axis=-1)  # [.., K+1]

    inside = jnp.abs(x) < B
    xs = jnp.clip(x, -B, B)
    knots = yk if inverse else xk
    # bin index via comparisons (K is small); clip keeps boundary in-range
    k = jnp.clip(
        jnp.sum(xs[..., None] >= knots[..., 1:], axis=-1), 0, K - 1
    )

    def take(a):
        return jnp.take_along_axis(a, k[..., None], axis=-1)[..., 0]

    x_lo, w = take(xk), take(widths)
    y_lo, h = take(yk), take(heights)
    d_lo = take(derivs)
    d_hi = jnp.take_along_axis(derivs, k[..., None] + 1, axis=-1)[..., 0]
    s = h / w

    if inverse:
        dy = xs - y_lo
        a = h * (s - d_lo) + dy * (d_hi + d_lo - 2.0 * s)
        b = h * d_lo - dy * (d_hi + d_lo - 2.0 * s)
        c = -s * dy
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        xi = (2.0 * c) / (-b - jnp.sqrt(disc))
        xi = jnp.clip(xi, 0.0, 1.0)
        # two Newton steps: the f32 quadratic solve leaves ~1e-4 error that
        # compounds through deep coupling stacks (θ of the next inverse is
        # conditioned on this output); Newton converges it to float noise
        for _ in range(2):
            den_i = s + (d_hi + d_lo - 2.0 * s) * xi * (1.0 - xi)
            f_i = y_lo + h * (s * xi * xi + d_lo * xi * (1.0 - xi)) / den_i
            dnum = s * s * (d_hi * xi * xi + 2.0 * s * xi * (1.0 - xi)
                            + d_lo * (1.0 - xi) * (1.0 - xi))
            dfdxi = w * dnum / (den_i * den_i)
            xi = xi - (f_i - xs) / jnp.maximum(dfdxi, 1e-12)
            xi = jnp.clip(xi, 0.0, 1.0)
        out = x_lo + xi * w
    else:
        xi = jnp.clip((xs - x_lo) / w, 0.0, 1.0)
        num = h * (s * xi * xi + d_lo * xi * (1.0 - xi))
        den = s + (d_hi + d_lo - 2.0 * s) * xi * (1.0 - xi)
        out = y_lo + num / den

    den = s + (d_hi + d_lo - 2.0 * s) * xi * (1.0 - xi)
    deriv_num = s * s * (d_hi * xi * xi + 2.0 * s * xi * (1.0 - xi)
                         + d_lo * (1.0 - xi) * (1.0 - xi))
    log_deriv = jnp.log(deriv_num) - 2.0 * jnp.log(den)

    y = jnp.where(inside, out, x)
    log_deriv = jnp.where(inside, log_deriv, 0.0)
    return y, log_deriv


def _transform_half(
    params_gnn: dict, cfg: FlowConfig, cond: jax.Array, h: jax.Array,
    graph: GraphBatch, inverse: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Transform one half `h` conditioned on the other half `cond` via the
    coupling's GNN. Returns (new_half masked, forward log-det f32[B])."""
    c = cond
    if cfg.st_input_norm:
        mu = jnp.mean(c, axis=-1, keepdims=True)
        var = jnp.var(c, axis=-1, keepdims=True)
        c = (c - mu) * jax.lax.rsqrt(var + 1e-5)
        c = c * graph.node_mask[..., None]
    out = apply_gnn(params_gnn, cfg.st_gnn_config(), c, graph)
    if cfg.coupling == "rqs":
        K = cfg.rqs_bins
        theta = out.reshape(*h.shape, 3 * K - 1)
        y, log_d = _rqs(h, theta, K, cfg.rqs_range, inverse)
        y = y * graph.node_mask[..., None]
        return y, _masked_sum(log_d, graph)
    s_raw, t = jnp.split(out, 2, axis=-1)
    if cfg.coupling == "additive":
        s = jnp.zeros_like(s_raw)
    else:
        s = cfg.s_cap * jnp.tanh(s_raw / cfg.s_cap)
    if inverse:
        y = (h - t) * jnp.exp(-s)
    else:
        y = h * jnp.exp(s) + t
    y = y * graph.node_mask[..., None]
    return y, _masked_sum(s, graph)


def coupling_forward(
    layer_params: dict, cfg: FlowConfig, x: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """One GRevNet coupling step. x f32[B,N,D] -> (z, logdet[B])."""
    x0, x1 = jnp.split(x, 2, axis=-1)
    with jax.named_scope("coupling_F1"):
        z1, ld1 = _transform_half(layer_params["F1"], cfg, x0, x1, graph,
                                  inverse=False)
    with jax.named_scope("coupling_F2"):
        z0, ld2 = _transform_half(layer_params["F2"], cfg, z1, x0, graph,
                                  inverse=False)
    z = jnp.concatenate([z0, z1], axis=-1) * graph.node_mask[..., None]
    return z, ld1 + ld2


def coupling_inverse(
    layer_params: dict, cfg: FlowConfig, z: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, jax.Array]:
    """Exact inverse of `coupling_forward`. Returns (x, logdet of forward)."""
    z0, z1 = jnp.split(z, 2, axis=-1)
    x0, ld2 = _transform_half(layer_params["F2"], cfg, z1, z0, graph,
                              inverse=True)
    x1, ld1 = _transform_half(layer_params["F1"], cfg, x0, z1, graph,
                              inverse=True)
    x = jnp.concatenate([x0, x1], axis=-1) * graph.node_mask[..., None]
    return x, ld1 + ld2


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

    (z, logdet), _ = jax.lax.scan(body, (x, ld0), couplings,
                                  unroll=cfg.scan_unroll)
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
    (x, logdet), _ = jax.lax.scan(body, init, couplings, reverse=True,
                                  unroll=cfg.scan_unroll)
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
