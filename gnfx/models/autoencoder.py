"""Graph auto-encoder: permutation-equivariant encoder GNN + pairwise-distance
edge decoder.

Covers SURVEY.md §2.1 #5 from the spec in §2.3 [arXiv:1905.13177 §3.2.1]:
the encoder runs message passing over the *true* adjacency on random node
features (structure is the only signal; random features break symmetry), and
the decoder scores an edge from the squared distance between embeddings:

    Â_uv = sigmoid(C · (1 − ‖x_u − x_v‖²))

— a monotone-decreasing squashing of pairwise distance, trained with
class-weighted BCE against the true adjacency; generation thresholds at 0.5.
The pairwise distance matrix is computed as ‖x_u‖² + ‖x_v‖² − 2·x@xᵀ — one
MXU matmul, no N×N×D materialisation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gnfx.config import AEConfig
from gnfx.graph import GraphBatch
from gnfx.ops.gnn import GNNConfig, apply_gnn, init_gnn
from gnfx.ops.mlp import apply_mlp, init_mlp


def encoder_gnn_config(cfg: AEConfig) -> GNNConfig:
    return GNNConfig(
        in_dim=cfg.feature_dim,
        hidden_dim=cfg.gnn_hidden,
        out_dim=cfg.embed_dim,
        num_rounds=cfg.gnn_rounds,
        aggregation=cfg.aggregation,  # type: ignore[arg-type]
        message_mode=cfg.message_mode,  # type: ignore[arg-type]
    )


def init_autoencoder(key: jax.Array, cfg: AEConfig) -> dict:
    k_enc, k_dec = jax.random.split(key)
    params = {"encoder": init_gnn(k_enc, encoder_gnn_config(cfg))}
    if cfg.decoder == "mlp":
        # symmetric pair features [x_u + x_v, (x_u − x_v)²] -> logit
        # correction; zero-init final layer => starts as the dist decoder
        params["decoder"] = init_mlp(
            k_dec,
            [2 * cfg.embed_dim, cfg.decoder_hidden, cfg.decoder_hidden, 1],
            final_zeros=True,
        )
    return params


def random_node_features(key: jax.Array, graph: GraphBatch, feature_dim: int) -> jax.Array:
    """~N(0,1) features on real node slots (SURVEY.md §2.3: node
    position/random features; random is the permutation-safe choice)."""
    f = jax.random.normal(key, (graph.batch_size, graph.max_nodes, feature_dim))
    return f * graph.node_mask[..., None]


def encode(params: dict, cfg: AEConfig, feats: jax.Array, graph: GraphBatch) -> jax.Array:
    """Node embeddings f32[B, N, embed_dim], zero on padding."""
    return apply_gnn(params["encoder"], encoder_gnn_config(cfg), feats, graph)


def canonicalize_embeddings(
    x: jax.Array, cfg: AEConfig, node_mask: jax.Array,
    key: jax.Array | None = None,
) -> jax.Array:
    """Optional per-graph canonicalization of encoder embeddings before the
    flow (stage-1→2 handoff).

    The distance decoder (below) is invariant to the whole rigid group —
    translations AND orthogonal maps of the embedding space — so each
    graph's cloud mean and orientation are pure nuisance entropy the flow
    would otherwise have to model (the orientation alone is a
    D(D−1)/2-dimensional manifold: 190 dims at D=20).

    `cfg.canonicalize == "center"` subtracts the masked per-graph mean.
    `cfg.canonicalize == "pca"` additionally rotates each cloud onto its
    principal axes (descending variance) and fixes the per-axis reflection
    by making the third moment (skew) non-negative, so any input rotation
    maps to the same canonical form. With a `key` and `cfg.canon_jitter > 0`,
    small isotropic noise is added afterwards so the training density stays
    proper (exact centering puts the data on the measure-zero Σx=0 subspace,
    and exact axis alignment zeroes the off-diagonal covariances — both
    would drive the flow's scales degenerate; jitter also washes out the
    eigenvector instability at near-degenerate eigenvalues / near-zero
    skews). Sampling needs no inverse: decoded edges are unchanged by any
    rigid map. Padded slots stay exactly 0."""
    if cfg.canonicalize == "none":
        return x
    if cfg.canonicalize not in ("center", "pca"):
        raise ValueError(f"unknown canonicalize mode {cfg.canonicalize!r}")
    mask = node_mask[..., None]
    n = jnp.maximum(jnp.sum(node_mask, axis=1), 1.0)[:, None, None]
    mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
    x = (x - mean) * mask
    if cfg.canonicalize == "pca":
        # masked covariance [B, D, D]; eigh ascending -> flip to descending
        cov = jnp.einsum("bnd,bne->bde", x, x) / n
        _, vecs = jnp.linalg.eigh(cov)
        vecs = vecs[:, :, ::-1]
        y = jnp.einsum("bnd,bde->bne", x, vecs)
        # reflection fix: per-axis sign from the third moment; sign(0) = 0
        # would zero an axis, so treat exact zeros as +1
        skew = jnp.sum(y**3 * mask, axis=1)
        sign = jnp.where(skew < 0.0, -1.0, 1.0)
        x = y * sign[:, None, :] * mask
    if key is not None and cfg.canon_jitter > 0.0:
        x = x + cfg.canon_jitter * jax.random.normal(key, x.shape) * mask
    return x


def pairwise_sq_dists(x: jax.Array) -> jax.Array:
    """d²[b, u, v] = ‖x_u − x_v‖² via the Gram-matrix identity (MXU-shaped)."""
    sq = jnp.sum(x * x, axis=-1)
    gram = jnp.einsum("bud,bvd->buv", x, x, preferred_element_type=jnp.float32)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def decode_edge_logits(params: dict | None, cfg: AEConfig, x: jax.Array) -> jax.Array:
    """Edge logits f32[B, N, N] from embeddings.

    Always includes the reference's distance term C(1 − d²) (SURVEY.md §2.3);
    with cfg.decoder == "mlp" a learned symmetric pair-MLP correction is
    added: MLP([x_u + x_v, (x_u − x_v)²]) — symmetric in (u, v) by
    construction, so the decoded adjacency stays symmetric."""
    d2 = pairwise_sq_dists(x)
    logits = cfg.decoder_c * (1.0 - d2)
    if cfg.decoder == "mlp":
        s = x[:, :, None, :] + x[:, None, :, :]
        q = jnp.square(x[:, :, None, :] - x[:, None, :, :])
        h = jnp.concatenate([s, q], axis=-1)
        logits = logits + apply_mlp(params["decoder"], h)[..., 0]
    return logits


def decode_edges(params: dict | None, cfg: AEConfig, x: jax.Array) -> jax.Array:
    """Edge probabilities f32[B, N, N] from embeddings."""
    return jax.nn.sigmoid(decode_edge_logits(params, cfg, x))


def edge_pair_mask(graph: GraphBatch) -> jax.Array:
    """f32[B, N, N]: 1 on unordered real-node pairs (u < v)."""
    m = graph.node_mask
    pair = m[:, :, None] * m[:, None, :]
    upper = jnp.triu(jnp.ones_like(pair), k=1)
    return pair * upper


def reconstruction_loss(
    params: dict, cfg: AEConfig, feats: jax.Array, graph: GraphBatch
) -> Tuple[jax.Array, dict]:
    """Class-weighted BCE over real node pairs; returns (loss, aux metrics)."""
    x = encode(params, cfg, feats, graph)
    logits = decode_edge_logits(params, cfg, x)
    labels = graph.adj
    mask = edge_pair_mask(graph)
    # numerically stable BCE-with-logits
    per_pair = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    weights = jnp.where(labels > 0.5, cfg.pos_weight, 1.0) * mask
    if cfg.bridge_weight > 0.0 and cfg.bridge_mode == "dist":
        # bridge-aware focus (AEConfig.bridge_weight): upweight each true
        # edge by how much LONGER its embedding distance is than the
        # graph's mean true-edge distance — the longest edges are the ones
        # the sigmoid(C(1−d²)) decoder loses first, and in community-like
        # graphs those are exactly the connectivity-critical bridges.
        d2 = jax.lax.stop_gradient(pairwise_sq_dists(x))
        pos = labels * mask
        denom = jnp.maximum(jnp.sum(pos, axis=(1, 2), keepdims=True), 1.0)
        mean_d2 = jnp.sum(d2 * pos, axis=(1, 2), keepdims=True) / denom
        rel = d2 / jnp.maximum(mean_d2, 1e-6) - 1.0
        boost = cfg.bridge_weight * jnp.maximum(rel, 0.0)
        weights = weights * (1.0 + boost * pos)
    elif cfg.bridge_weight > 0.0 and cfg.bridge_mode == "tri":
        # exact structural variant: true edges whose endpoints share no
        # common neighbour (one MXU matmul) — the decoder's transitive
        # metric represents triangle-dense neighbourhoods for free, while
        # triangle-FREE edges (inter-community bridges) are the ones it
        # drops; boost only those, statically, from step 0.
        common = jnp.einsum("buk,bkv->buv", labels, labels,
                            preferred_element_type=jnp.float32)
        bridge = labels * (common < 0.5) * mask
        weights = weights * (1.0 + cfg.bridge_weight * bridge)
    loss = jnp.sum(per_pair * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    pred = (logits > 0.0).astype(jnp.float32)
    correct = jnp.sum((pred == labels) * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    tp = jnp.sum(pred * labels * mask)
    prec = tp / jnp.maximum(jnp.sum(pred * mask), 1.0)
    rec = tp / jnp.maximum(jnp.sum(labels * mask), 1.0)
    return loss, {"edge_acc": correct, "edge_precision": prec, "edge_recall": rec}


def decode_to_adjacency(
    params: dict | None, cfg: AEConfig, x: jax.Array, graph: GraphBatch,
    threshold: float = 0.5, connect_isolated: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Hard symmetric adjacency from embeddings.

    With `key=None`: threshold Â on real pairs (SURVEY.md §3c; 0.5 is the
    reference's rule — the sampler may select the threshold on the train
    split as a generation hyperparameter alongside temperature, which
    calibrates edge density). With a `key`: sample each unordered pair
    A_uv ~ Bernoulli(Â_uv) — the model-consistent decode (the generative
    model is p(x)·p(G|x) with Bernoulli edges; thresholding is its mode
    approximation), offered to the same train-split selection.

    `connect_isolated` conditions the decode on the data distribution's
    support (every training graph has min degree ≥ 1): any real node left
    isolated by the threshold gets one edge to its nearest neighbor in
    embedding distance. Off by default; selected on the train split like
    temperature/threshold.

    `threshold` and `connect_isolated` are deliberately DYNAMIC (traced)
    values: the selection grids sweep 24 (threshold, connect_isolated,
    temperature) combos, and baking them in as Python constants meant 24
    separate executables — on the axon relay that is ~20-60 s of compile
    EACH per fresh process, plus per-executable host memory the relay
    never returns. The isolated-node fix-up is therefore computed
    unconditionally and blended with an arithmetic flag."""
    probs = decode_edges(params, cfg, x)
    pair = graph.node_mask[:, :, None] * graph.node_mask[:, None, :]
    eye = jnp.eye(graph.max_nodes)[None]
    valid = pair * (1.0 - eye)
    if key is None:
        hard = (probs > threshold).astype(jnp.float32) * valid
    else:
        u = jax.random.uniform(key, probs.shape)
        hard = (u < probs).astype(jnp.float32) * valid
        hard = jnp.triu(hard, k=1)  # one draw per unordered pair
    # symmetrise (threshold decode is symmetric by construction, but be safe)
    hard = jnp.maximum(hard, jnp.transpose(hard, (0, 2, 1)))
    ci = jnp.asarray(connect_isolated, jnp.float32)
    d2 = pairwise_sq_dists(x) + 1e9 * (1.0 - valid)
    nn = jax.nn.one_hot(jnp.argmin(d2, axis=-1), graph.max_nodes)
    iso = (jnp.sum(hard, axis=-1) == 0).astype(jnp.float32)
    iso = iso * graph.node_mask * (graph.n_node > 1)[:, None]
    add = nn * iso[..., None] * valid * ci
    return jnp.maximum(hard, jnp.maximum(add, jnp.transpose(add, (0, 2, 1))))
