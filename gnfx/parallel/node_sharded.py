"""Node-sharded message passing — the sequence-parallel / ring-attention
analogue for graphs (SURVEY.md §5 'long-context', step 3).

When the padded node count N outgrows one chip's memory, shard the node axis
over the mesh: each device owns a block of receivers (its rows of adjᵀ) and a
block of senders (its slice of messages). Aggregation then runs as a ring:
at each of n steps a device contracts its receiver rows against the sender
chunk it currently holds and forwards that chunk to its ring neighbour via
`ppermute` — bandwidth-optimal (each chunk crosses each link once), peak
memory O(N·N/n + N/n·H) per device, and the compute/communication overlap is
XLA's to schedule.

Not needed for any BASELINE config (protein fits on one chip); exercised in
CI on the fake 8-device mesh for exact parity with the dense single-device
aggregation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def ring_aggregate(adj: jax.Array, msgs: jax.Array, mesh: Mesh,
                   axis: str = "data") -> jax.Array:
    """agg[v] = Σ_u adj[u, v] · msgs[u], node-sharded over `axis`.

    adj: f32[N, N] (global, row u → col v), msgs: f32[N, H]. N must divide
    the axis size. Returns agg f32[N, H] sharded the same way as msgs.
    """
    n_dev = mesh.shape[axis]
    n_total, h = msgs.shape
    if n_total % n_dev:
        raise ValueError(f"N={n_total} not divisible by mesh axis {n_dev}")
    chunk = n_total // n_dev

    # adjᵀ sharded by receiver rows; msgs sharded by sender rows
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    def run(adj_t_rows, msgs_local):
        me = jax.lax.axis_index(axis)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

        def body(i, carry):
            acc, held = carry
            # the chunk we hold at step i originated at device (me - i) % n
            src = (me - i) % n_dev
            cols = jax.lax.dynamic_slice_in_dim(
                adj_t_rows, src * chunk, chunk, axis=1
            )
            acc = acc + jnp.dot(cols, held, preferred_element_type=jnp.float32)
            held = jax.lax.ppermute(held, axis, perm)
            return acc, held

        acc0 = jnp.zeros((adj_t_rows.shape[0], h), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, n_dev, body, (acc0, msgs_local))
        return acc

    return run(jnp.transpose(adj), msgs)
