"""Model families: the GRevNet coupling flow, the graph auto-encoder, and the
supervised invertible-GNN classifier."""

from gnfx.models.flow import (  # noqa: F401
    FlowConfig,
    init_flow,
    flow_forward,
    flow_inverse,
    log_prob,
    sample_latents,
)
