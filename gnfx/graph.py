"""Dense padded graph-batch representation.

Replaces the reference's `graph_nets.GraphsTuple` flat senders/receivers
encoding (SURVEY.md §2.1 #1) with a TPU-first dense form: on TPU a masked
`adj @ messages` batched matmul rides the MXU and keeps every shape static for
XLA, which beats gather/scatter for the graph sizes this framework targets
(N up to a few hundred) and makes the fully-connected generation-time graph
free to construct. A sparse segment-sum oracle lives in `gnfx.ops.gnn` purely
as a test-time cross-check.

Conventions
-----------
* `nodes`     f32[B, N, D]   node features, zero on padded slots
* `adj`       f32[B, N, N]   adjacency; `adj[b, u, v] = 1` iff edge u->v.
                             Undirected graphs store both directions. Zero
                             rows/cols on padded slots. No self loops unless
                             explicitly requested.
* `node_mask` f32[B, N]      1.0 on real nodes
* `n_node`    i32[B]         number of real nodes per graph

All fields are arrays (no Python ints) so `GraphBatch` is a jit/scan/vmap-able
pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A batch of B graphs padded to N node slots with D-dim node features."""

    nodes: jax.Array      # f32[B, N, D]
    adj: jax.Array        # f32[B, N, N]
    node_mask: jax.Array  # f32[B, N]
    n_node: jax.Array     # i32[B]

    @property
    def batch_size(self) -> int:
        return self.nodes.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.nodes.shape[1]

    @property
    def node_dim(self) -> int:
        return self.nodes.shape[2]

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)

    def with_nodes(self, nodes: jax.Array) -> "GraphBatch":
        return dataclasses.replace(self, nodes=nodes)

    def num_real_dims(self) -> jax.Array:
        """Total number of real (unpadded) feature dimensions in the batch."""
        return jnp.sum(self.n_node) * self.node_dim

    def degrees(self) -> jax.Array:
        """In-degree per node slot, f32[B, N] (zero on padding)."""
        return jnp.sum(self.adj, axis=1)

    def fully_connected(self, self_loops: bool = False) -> "GraphBatch":
        """Same batch with the adjacency replaced by the complete graph over
        real nodes. Used at generation time when the structure is unknown
        (SURVEY.md §2.3: MP over the fully-connected padded node set)."""
        m = self.node_mask
        full = m[:, :, None] * m[:, None, :]
        if not self_loops:
            eye = jnp.eye(self.max_nodes, dtype=full.dtype)
            full = full * (1.0 - eye)
        return dataclasses.replace(self, adj=full)


def make_node_mask(n_node: jax.Array, max_nodes: int) -> jax.Array:
    """f32[B, N] mask from per-graph node counts."""
    slot = jnp.arange(max_nodes)[None, :]
    return (slot < n_node[:, None]).astype(jnp.float32)


def batch_from_dense(
    adjs: jax.Array, n_node: jax.Array, nodes: jax.Array | None = None
) -> GraphBatch:
    """Build a GraphBatch from already-dense adjacency + counts.

    `adjs` f32/bool[B, N, N], `n_node` i32[B]; `nodes` defaults to zeros with
    D=1. Padded rows/cols of `adjs` are zeroed defensively.
    """
    adjs = jnp.asarray(adjs, jnp.float32)
    n_node = jnp.asarray(n_node, jnp.int32)
    bsz, max_n = adjs.shape[0], adjs.shape[1]
    mask = make_node_mask(n_node, max_n)
    adjs = adjs * mask[:, :, None] * mask[:, None, :]
    if nodes is None:
        nodes = jnp.zeros((bsz, max_n, 1), jnp.float32)
    nodes = jnp.asarray(nodes, jnp.float32) * mask[..., None]
    return GraphBatch(nodes=nodes, adj=adjs, node_mask=mask, n_node=n_node)


# ---------------------------------------------------------------------------
# networkx interop (host-side, NumPy; used by data loading and evaluation)
# ---------------------------------------------------------------------------

def networkx_to_arrays(graphs: Sequence, max_nodes: int):
    """Pack a list of networkx graphs into (adj[B,N,N], n_node[B]) NumPy arrays.

    Graphs larger than `max_nodes` raise. Node labels are relabelled to
    0..n-1 in iteration order (matching the reference's converter semantics,
    SURVEY.md §2.1 #1).
    """
    import networkx as nx

    bsz = len(graphs)
    adj = np.zeros((bsz, max_nodes, max_nodes), np.float32)
    n_node = np.zeros((bsz,), np.int32)
    for i, g in enumerate(graphs):
        n = g.number_of_nodes()
        if n > max_nodes:
            raise ValueError(f"graph has {n} nodes > max_nodes={max_nodes}")
        g = nx.convert_node_labels_to_integers(g)
        for u, v in g.edges():
            adj[i, u, v] = 1.0
            adj[i, v, u] = 1.0
        n_node[i] = n
    return adj, n_node


def arrays_to_networkx(adj: np.ndarray, n_node: np.ndarray) -> list:
    """Inverse of `networkx_to_arrays`: dense padded adjacency -> nx graphs."""
    import networkx as nx

    out = []
    adj = np.asarray(adj)
    n_node = np.asarray(n_node)
    for i in range(adj.shape[0]):
        n = int(n_node[i])
        a = adj[i, :n, :n] > 0.5
        g = nx.from_numpy_array(np.asarray(a, dtype=np.int8))
        out.append(g)
    return out


def pad_node_count(n: int, bucket_sizes: Iterable[int]) -> int:
    """Smallest bucket >= n. Padding buckets bound wasted FLOPs per dataset
    (SURVEY.md §5 'long-context' strategy, step 1)."""
    for b in sorted(bucket_sizes):
        if n <= b:
            return b
    raise ValueError(f"no bucket >= {n} in {sorted(bucket_sizes)}")
