"""Distribution layer: device meshes, sharded training, sampling fan-out,
particle-sharded importance-weighted evaluation (SURVEY.md §2.2).

All communication is XLA collectives over ICI/DCN driven by
`jit`/`shard_map` on a `jax.sharding.Mesh` — the TPU-native equivalent of
the NCCL/MPI transports the reference never had."""

from gnfx.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    shard_params_tp,
)
