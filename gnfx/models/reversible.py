"""O(1)-depth-memory reversible backbone (SURVEY.md §2.1 #7, §7 phase 5).

`flow_forward_rev` computes the same z as `flow_forward` but its backward
pass stores NO per-layer activations: the custom VJP reconstructs each
layer's input from its output via the exact coupling inverse, then replays
that single layer's VJP — activation memory is O(1) in the number of
couplings T instead of O(T). This is the paper's headline argument for
reversible GNNs on large graphs [P §4.1 via SURVEY.md §2.3].

Numerical note: reconstruction goes through exp(±s) chains; with the s_cap
soft clamp the round-trip drift is ~1e-6 relative (asserted against plain
autodiff in tests). `jax.checkpoint` over the scan body is the fallback if a
model ever drifts beyond tolerance (not needed at current depths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gnfx.graph import GraphBatch
from gnfx.models.flow import FlowConfig, coupling_forward, coupling_inverse


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def flow_forward_rev(params: dict, cfg: FlowConfig, x: jax.Array,
                     graph: GraphBatch) -> jax.Array:
    """z = f_T ∘ … ∘ f_1(x), no log-det (supervised backbone use)."""

    def body(h, layer_params):
        z, _ = coupling_forward(layer_params, cfg, h, graph)
        return z, None

    z, _ = jax.lax.scan(body, x, params)
    return z


def _fwd(params, cfg, x, graph):
    z = flow_forward_rev(params, cfg, x, graph)
    # residuals: only the OUTPUT (plus params/graph refs) — no activations
    return z, (params, z, graph)


def _bwd(cfg, residuals, dz):
    params, z, graph = residuals

    def body(carry, layer_params):
        z_t, dz_t = carry
        x_prev, _ = coupling_inverse(layer_params, cfg, z_t, graph)
        x_prev = jax.lax.stop_gradient(x_prev)
        _, vjp_fn = jax.vjp(
            lambda p, xx: coupling_forward(p, cfg, xx, graph)[0],
            layer_params, x_prev,
        )
        dp, dx = vjp_fn(dz_t)
        return (x_prev, dx), dp

    (x0, dx), dparams = jax.lax.scan(body, (z, dz), params, reverse=True)
    zero_graph = jax.tree.map(jnp.zeros_like, graph)
    return dparams, dx, zero_graph


flow_forward_rev.defvjp(_fwd, _bwd)
