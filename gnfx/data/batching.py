"""Host-side batching: networkx datasets -> dense padded NumPy arrays ->
minibatch iterator of `GraphBatch`es.

Replaces the reference's per-step Python `feed_dict` padding (SURVEY.md §3a
hot loop) with one up-front vectorised pack; the training loop then just
slices device-ready arrays. Deterministic given (seed, epoch) so data order
is reproducible for checkpoint-exact resume (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import jax
import numpy as np

from gnfx.graph import GraphBatch, batch_from_dense, networkx_to_arrays


def dataset_to_arrays(graphs: Sequence, max_nodes: int):
    """Pack nx graphs -> (adj[B,N,N] f32, n_node[B] i32) NumPy arrays."""
    return networkx_to_arrays(graphs, max_nodes)


def empirical_size_distribution(n_node: np.ndarray, max_nodes: int) -> np.ndarray:
    """p[k] = P(|V| = k), k in [0, max_nodes]; the sampler draws sizes from
    this (SURVEY.md §3c: n ~ empirical size dist)."""
    counts = np.bincount(np.asarray(n_node), minlength=max_nodes + 1).astype(np.float64)
    return counts / counts.sum()


def batch_iterator(
    adj: np.ndarray,
    n_node: np.ndarray,
    batch_size: int,
    *,
    seed: int = 0,
    epoch: int = 0,
    nodes: np.ndarray | None = None,
    drop_remainder: bool = True,
) -> Iterator[GraphBatch]:
    """Shuffled minibatches for one epoch; deterministic in (seed, epoch)."""
    num = adj.shape[0]
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    perm = rng.permutation(num)
    end = num - (num % batch_size) if drop_remainder else num
    for start in range(0, end, batch_size):
        idx = perm[start : start + batch_size]
        yield batch_from_dense(
            adj[idx], n_node[idx], None if nodes is None else nodes[idx]
        )


def _step_indices(step: int, num: int, batch_size: int, seed: int) -> np.ndarray:
    """Graph indices for one training step — a pure function of (seed, step)
    so data order is reproducible for checkpoint-exact resume."""
    per_epoch = max(1, num // batch_size)
    epoch, pos = divmod(step, per_epoch)
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    perm = rng.permutation(num)
    idx = perm[pos * batch_size : (pos + 1) * batch_size]
    if len(idx) < batch_size:  # pad the tail by wrapping
        idx = np.concatenate([idx, perm[: batch_size - len(idx)]])
    return idx


def repeat_batches(
    adj: np.ndarray,
    n_node: np.ndarray,
    batch_size: int,
    num_steps: int,
    *,
    seed: int = 0,
    start_step: int = 0,
    nodes: np.ndarray | None = None,
) -> Iterator[GraphBatch]:
    """Infinite-style iterator yielding exactly `num_steps` batches, cycling
    epochs. `start_step` fast-forwards after checkpoint resume: the stream is
    a pure function of (seed, step)."""
    num = adj.shape[0]
    for step in range(start_step, num_steps):
        idx = _step_indices(step, num, batch_size, seed)
        yield batch_from_dense(
            adj[idx], n_node[idx], None if nodes is None else nodes[idx]
        )


def stacked_repeat_batches(
    adj: np.ndarray,
    n_node: np.ndarray,
    batch_size: int,
    num_steps: int,
    chunk: int,
    *,
    seed: int = 0,
    start_step: int = 0,
    nodes: np.ndarray | None = None,
) -> Iterator[tuple[np.ndarray, GraphBatch]]:
    """Chunked variant of `repeat_batches` for scan-over-steps training:
    yields (steps i32[K], GraphBatch stacked to [K, B, ...]) covering the
    same per-step batches in the same order (step k of a chunk equals the
    k-th batch `repeat_batches` would yield). The final chunk may be
    shorter. One host->device transfer per K steps instead of per step —
    the training loop scans the K leading slices inside a single jit call
    (dispatch latency amortised; SURVEY.md §3a hot loop)."""
    num = adj.shape[0]
    step = start_step
    while step < num_steps:
        k = min(chunk, num_steps - step)
        steps = np.arange(step, step + k, dtype=np.int32)
        idx = np.stack([_step_indices(s, num, batch_size, seed) for s in steps])
        flat = idx.reshape(-1)
        gb = batch_from_dense(
            adj[flat], n_node[flat], None if nodes is None else nodes[flat]
        )
        yield steps, jax.tree.map(
            lambda x: x.reshape(k, batch_size, *x.shape[1:]), gb
        )
        step += k


def device_stacked_repeat_batches(
    adj: np.ndarray,
    n_node: np.ndarray,
    batch_size: int,
    num_steps: int,
    chunk: int,
    *,
    seed: int = 0,
    start_step: int = 0,
    nodes: np.ndarray | None = None,
) -> Iterator[tuple[np.ndarray, GraphBatch]]:
    """Device-resident variant of `stacked_repeat_batches`: bit-identical
    per-step batches (same `_step_indices` stream), but the whole dataset is
    uploaded to the default device ONCE and each chunk's [K, B, ...] batch
    stack is gathered ON DEVICE from a [K, B] i32 index transfer.

    Two measured reasons (round 4, this box):
      * host->device volume drops from O(K*B*N^2) floats per chunk to
        O(K*B) ints: the axon PJRT relay retains host-side copies of every
        transfer (observed ~5 GB/min RSS growth at protein N=512 — the
        worker-OOM driver), and
      * the 4-core host stops re-packing adjacency it already shipped; the
        TPU pipeline is host-fed, so feeder CPU time is training stall time.
    """
    import jax.numpy as jnp

    adj_all = jnp.asarray(adj, jnp.float32)
    n_all = jnp.asarray(n_node, jnp.int32)
    nodes_all = None if nodes is None else jnp.asarray(nodes, jnp.float32)

    # dataset arrays passed as ARGUMENTS (not closure constants) so they are
    # not re-embedded into each compiled executable
    @jax.jit
    def _gather(a_all, n_all, idx):
        flat = idx.reshape(-1)
        gb = batch_from_dense(a_all[flat], n_all[flat])
        k, b = idx.shape
        return jax.tree.map(lambda x: x.reshape(k, b, *x.shape[1:]), gb)

    @jax.jit
    def _gather_nodes(a_all, n_all, x_all, idx):
        flat = idx.reshape(-1)
        gb = batch_from_dense(a_all[flat], n_all[flat], x_all[flat])
        k, b = idx.shape
        return jax.tree.map(lambda x: x.reshape(k, b, *x.shape[1:]), gb)

    num = adj.shape[0]
    step = start_step
    while step < num_steps:
        k = min(chunk, num_steps - step)
        steps = np.arange(step, step + k, dtype=np.int32)
        idx = np.stack([_step_indices(s, num, batch_size, seed) for s in steps])
        idx = jnp.asarray(idx)
        if nodes_all is None:
            yield steps, _gather(adj_all, n_all, idx)
        else:
            yield steps, _gather_nodes(adj_all, n_all, nodes_all, idx)
        step += k
