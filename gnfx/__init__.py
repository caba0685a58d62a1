"""gnfx — a TPU-native probabilistic inference engine for graph normalizing flows.

A from-scratch JAX/XLA framework with the capabilities of the reference
`jliu/graph-normalizing-flows` (arXiv:1905.13177): GRevNet reversible
message-passing coupling layers with exact change-of-variables log-likelihood,
two-stage graph generation (graph auto-encoder + flow over node embeddings),
supervised invertible-GNN node classification, and the GraphRNN MMD evaluation
protocol (degree / clustering / orbit, with a native C++ orbit counter).

Design stance (see SURVEY.md §7): everything on the compute path is a pure
function over fixed-shape padded arrays; a batch of graphs is a dense masked
`GraphBatch` pytree so message passing is batched matmuls on the MXU, not
gather/scatter. Distribution is mesh-sharded `jit`/`shard_map` with XLA
collectives over ICI — no NCCL-style transport.

Reference provenance: `/root/reference` was EMPTY at build time (SURVEY.md §0);
behavioral parity targets come from SURVEY.md §2.3 (the paper's equations) and
BASELINE.json. File citations therefore point at SURVEY.md sections instead of
reference file:line.
"""

__version__ = "0.1.0"

from gnfx.graph import GraphBatch  # noqa: F401
