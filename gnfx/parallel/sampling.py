"""Device-fanned inverse-flow sampling (SURVEY.md §2.2 'sampling-chain
parallel').

Each device generates graphs from its shard of the batch: sizes and the
PRNG key are sharded over the data axis (per-device folds of one key), the
inverse flow and edge decoding run fully sharded, and only the dense
adjacencies return to the host. `graphs/s` with scaling efficiency vs one
chip is a north-star metric (BASELINE.json)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gnfx.config import AEConfig
from gnfx.graph import arrays_to_networkx
from gnfx.models.flow import FlowConfig
from gnfx.sample import sample_batch_device


def sample_graphs_sharded(
    flow_params: dict,
    ae_params: dict | None,
    fcfg: FlowConfig,
    acfg: AEConfig,
    num_samples: int,
    size_dist: np.ndarray,
    max_nodes: int,
    mesh,
    *,
    seed: int = 0,
    per_device_batch: int = 64,
    min_nodes: int = 2,
    temperature: float = 1.0,
    threshold: float = 0.5,
) -> List:
    """Generate `num_samples` graphs with the batch sharded over the mesh's
    data axis. Sizes are drawn on the host from the empirical distribution;
    device d works on its own slice of every batch."""
    n_data = mesh.shape["data"]
    batch = per_device_batch * n_data
    rng = np.random.default_rng(seed)
    sizes = np.maximum(
        rng.choice(len(size_dist), size=num_samples, p=size_dist), min_nodes
    ).astype(np.int32)
    key = jax.random.PRNGKey(seed)
    batch_sharding = NamedSharding(mesh, P("data"))

    out = []
    for start in range(0, num_samples, batch):
        chunk = sizes[start : start + batch]
        pad = batch - len(chunk)
        chunk_p = (
            np.concatenate([chunk, np.full(pad, min_nodes, np.int32)])
            if pad
            else chunk
        )
        n_node = jax.device_put(jnp.asarray(chunk_p), batch_sharding)
        adj, _ = sample_batch_device(
            flow_params, ae_params, fcfg, acfg, jax.random.fold_in(key, start),
            n_node, max_nodes, temperature, threshold,
        )
        adj_np = np.asarray(jax.device_get(adj))[: len(chunk)]
        out.extend(arrays_to_networkx(adj_np, chunk))
    return out
