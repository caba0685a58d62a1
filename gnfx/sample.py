"""Graph generation: inverse flow from the Gaussian base + edge decoding.

Covers SURVEY.md §3c: n ~ empirical size distribution, z ~ N(0, I) on n
node slots, x = flow⁻¹(z) with message passing over the fully-connected
graph, Â = decode(x), threshold at 0.5. The whole device side is one `jit`
over a full batch of samples; sizes are drawn on the host. `graphs/s` here
is a north-star metric (BASELINE.json) — the device fan-out version lives in
`gnfx.parallel.sampling`.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnfx.config import AEConfig
from gnfx.graph import GraphBatch, arrays_to_networkx, make_node_mask
from gnfx.models import autoencoder as ae
from gnfx.models.flow import FlowConfig, flow_inverse


@functools.partial(jax.jit,
                   static_argnames=("fcfg", "acfg", "max_nodes",
                                    "edge_sample", "want_probs"))
def sample_batch_device(
    flow_params: dict,
    ae_params: dict | None,
    fcfg: FlowConfig,
    acfg: AEConfig,
    key: jax.Array,
    n_node: jax.Array,
    max_nodes: int,
    temperature: float = 1.0,
    threshold: float = 0.5,
    connect_isolated: bool = False,
    edge_sample: bool = False,
    want_probs: bool = False,
    decode_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array | None]:
    """Device side: latents -> inverse flow -> hard adjacency f32[B, N, N].

    Returns ``(hard_adjacency, edge_probs | None)``: the probabilities feed
    the host-side connect-components repair and are only materialised when
    ``want_probs`` (a second [B, N, N] jit output would otherwise tax every
    sampling call — it is a returned buffer, not DCE-able). Static flag:
    costs one extra executable, compiled only when the repair is used.
    `edge_sample=True` draws A_uv ~ Bernoulli(Â_uv) instead of thresholding
    (the model-consistent decode; see decode_to_adjacency)."""
    bsz = n_node.shape[0]
    mask = make_node_mask(n_node, max_nodes)
    nodes = jnp.zeros((bsz, max_nodes, fcfg.node_dim), jnp.float32)
    gb = GraphBatch(nodes=nodes, adj=jnp.zeros((bsz, max_nodes, max_nodes)),
                    node_mask=mask, n_node=n_node).fully_connected()
    k_z, k_edge = jax.random.split(key)
    z = temperature * jax.random.normal(k_z, nodes.shape, jnp.float32) * mask[..., None]
    x, _ = flow_inverse(flow_params, fcfg, z, gb)
    # decode_scale divides embedding distances before decoding (>1 → denser).
    # At sharp decoder_c (protein's c=100) the sigmoid is a near-hard cutoff
    # at d≈1 and the probability threshold moves the decode radius by <1%,
    # so this is the knob that actually calibrates edge density there.
    # Dynamic (traced) like temperature/threshold — no per-value executable.
    x = x / jnp.asarray(decode_scale, jnp.float32)
    hard = ae.decode_to_adjacency(ae_params, acfg, x, gb, threshold,
                                  connect_isolated,
                                  key=k_edge if edge_sample else None)
    if not want_probs:
        return hard, None
    # masked edge probabilities (XLA CSEs the decoder matmul with the one
    # inside decode_to_adjacency — this costs nothing extra)
    pair = mask[:, :, None] * mask[:, None, :]
    probs = ae.decode_edges(ae_params, acfg, x) * pair \
        * (1.0 - jnp.eye(max_nodes)[None])
    return hard, probs


def _component_labels(adj: np.ndarray) -> np.ndarray:
    """Connected-component label per node of a dense 0/1 adjacency [n, n]."""
    n = adj.shape[0]
    labels = np.full(n, -1, np.int32)
    cur = 0
    for s in range(n):
        if labels[s] >= 0:
            continue
        stack = [s]
        labels[s] = cur
        while stack:
            u = stack.pop()
            for v in np.nonzero(adj[u])[0]:
                if labels[v] < 0:
                    labels[v] = cur
                    stack.append(v)
        cur += 1
    return labels


def connect_components_np(adj: np.ndarray, probs: np.ndarray,
                          n: int) -> np.ndarray:
    """Decode-side connectivity repair: while the n-node graph is
    disconnected, add the highest-probability edge whose endpoints lie in
    different components (≤ n−1 additions; each merges two components).

    The analogue of `connect_isolated` one level up: every training graph
    is connected, so the decode may condition on that support. Host-side
    numpy (graphs are ≤ ~500 nodes; this is microseconds), selected on the
    train split like temperature/threshold via the connectivity-aware
    selection score (gnfx.eval.selection)."""
    out = adj.copy()
    if n <= 1:
        return out
    a = out[:n, :n]
    p = probs[:n, :n]
    while True:
        labels = _component_labels(a)
        if labels.max() == 0:
            return out
        cross = labels[:, None] != labels[None, :]
        masked = np.where(cross, p, -1.0)
        u, v = np.unravel_index(int(np.argmax(masked)), masked.shape)
        a[u, v] = a[v, u] = 1.0


def break_triangles_np(adj: np.ndarray, probs: np.ndarray,
                       n: int) -> np.ndarray:
    """Decode-side triangle repair: while the n-node graph contains a
    triangle, delete the LOWEST-probability edge that participates in one.

    The mirror image of `connect_components_np`, conditioning the decode on
    a different support property: every real grid/lattice graph is
    triangle-free, while the distance decoder happily closes lattice
    diagonals (measured: 5 triangles/graph in AE roundtrips of REAL grids,
    runs/grid-pca/triangle_probe.json — and no in-family AE lever moved
    that ceiling, runs/grid_ae_screen_cpu.json). Selected on the train
    split like every other decode option: on triangle-rich data (community)
    it destroys the statistics and the selection score rejects it; on
    triangle-free data it removes exactly the decoder's systematic error.
    Host-side numpy; each deletion strictly reduces triangle count, so it
    terminates in ≤ |E| steps."""
    out = adj.copy()
    if n < 3:
        return out
    a = out[:n, :n]
    p = probs[:n, :n]
    while True:
        common = (a @ a) * a          # for each edge: # common neighbours
        tri_u, tri_v = np.nonzero(np.triu(common, 1))
        if len(tri_u) == 0:
            return out
        worst = np.argmin(p[tri_u, tri_v])
        u, v = tri_u[worst], tri_v[worst]
        a[u, v] = a[v, u] = 0.0


def sample_graphs(
    flow_params: dict,
    ae_params: dict | None,
    fcfg: FlowConfig,
    acfg: AEConfig,
    num_samples: int,
    size_dist: np.ndarray,
    max_nodes: int,
    *,
    seed: int = 0,
    batch_size: int = 64,
    min_nodes: int = 2,
    temperature: float = 1.0,
    threshold: float = 0.5,
    connect_isolated: bool = False,
    edge_sample: bool = False,
    connect_components: bool = False,
    break_triangles: bool = False,
    decode_scale: float = 1.0,
) -> List:
    """Generate `num_samples` networkx graphs. Host draws sizes; device runs
    fixed-shape batches; remainder batches are padded and truncated."""
    rng = np.random.default_rng(seed)
    sizes = rng.choice(len(size_dist), size=num_samples, p=size_dist)
    sizes = np.maximum(sizes, min_nodes).astype(np.int32)
    key = jax.random.PRNGKey(seed)
    out = []
    for start in range(0, num_samples, batch_size):
        chunk = sizes[start : start + batch_size]
        pad = batch_size - len(chunk)
        chunk_p = np.concatenate([chunk, np.full(pad, min_nodes, np.int32)]) if pad else chunk
        adj, probs = sample_batch_device(
            flow_params, ae_params, fcfg, acfg, jax.random.fold_in(key, start),
            jnp.asarray(chunk_p), max_nodes, temperature, threshold,
            connect_isolated, edge_sample,
            want_probs=connect_components or break_triangles,
            decode_scale=decode_scale,
        )
        adj_np = np.asarray(jax.device_get(adj))[: len(chunk)]
        if connect_components or break_triangles:
            probs_np = np.asarray(jax.device_get(probs))[: len(chunk)]
            reps = []
            for i in range(len(chunk)):
                a = adj_np[i]
                if break_triangles:
                    # break first: deletions can disconnect, but the
                    # connectivity repair below only adds CROSS-component
                    # edges, and a cross-component edge can never close a
                    # triangle (a common neighbour of both endpoints would
                    # already connect the components) — so break-then-connect
                    # leaves the graph both triangle-free and connected.
                    a = break_triangles_np(a, probs_np[i], int(chunk[i]))
                if connect_components:
                    a = connect_components_np(a, probs_np[i], int(chunk[i]))
                reps.append(a)
            adj_np = np.stack(reps)
        out.extend(arrays_to_networkx(adj_np, chunk))
    return out
