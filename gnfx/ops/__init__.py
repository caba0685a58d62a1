"""Compute-path ops: MLPs and message passing (XLA einsum MP — measured
at/above a hand-written fused Pallas coupling kernel at every production
shape incl. protein N=512; see runs/pallas_bench.json and BASELINE.md)."""

from gnfx.ops.mlp import MLPParams, init_mlp, apply_mlp  # noqa: F401
from gnfx.ops.gnn import GNNConfig, init_gnn, apply_gnn  # noqa: F401
