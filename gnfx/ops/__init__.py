"""Compute-path ops: MLPs, message passing, and Pallas kernels."""

from gnfx.ops.mlp import MLPParams, init_mlp, apply_mlp  # noqa: F401
from gnfx.ops.gnn import GNNConfig, init_gnn, apply_gnn  # noqa: F401
