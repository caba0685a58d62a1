"""Device mesh + sharding layout.

The mesh has two axes (SURVEY.md §2.2):
  * ``data``  — primary: graph batches shard their leading axis here;
                gradient all-reduce is the `psum` XLA inserts automatically
                for a jit-compiled step with data-sharded inputs.
  * ``model`` — passive tensor parallelism: MLP weight matrices optionally
                shard their hidden dimension here; XLA's SPMD partitioner
                propagates and inserts the contraction all-reduces. No
                dedicated kernels (documented non-goal beyond this).

Multi-host: the same code runs under `jax.distributed.initialize` — the mesh
spans all processes' devices, batches are globally sharded, collectives ride
ICI within a slice and DCN across hosts. On this box the mesh degrades to
1×1 on the real chip and 8×1 in fake-device tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnfx.graph import GraphBatch


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(gb: GraphBatch, mesh: Mesh, *, stacked: bool = False) -> GraphBatch:
    """Shard every field's batch axis over the data axis. With
    ``stacked=True`` the fields are [K, B, ...] scan-over-steps chunks:
    the step axis K is replicated (every device scans all K steps) and the
    batch axis B is sharded."""
    s = NamedSharding(mesh, P(None, "data") if stacked else P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, s), gb)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_params_tp(params, mesh: Mesh, min_dim: int = 64):
    """Passive TP: shard the last axis of big matrices over 'model'.

    Flow params are stacked [T, fan_in, fan_out]; matrices whose fan_out is
    divisible by the model-axis size and >= min_dim get P(..., 'model'),
    everything else replicates. With model=1 this is pure replication.
    """
    n_model = mesh.shape["model"]

    def place(x):
        if (
            n_model > 1
            and x.ndim >= 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % n_model == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def batch_pspec() -> P:
    return P("data")
