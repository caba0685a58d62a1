"""Plain-pytree MLPs.

The whole framework uses explicit parameter pytrees (dicts of arrays) with
pure `init`/`apply` functions instead of a module system: parameters stack
cleanly along a leading axis for `lax.scan` over coupling layers, and nothing
is hidden from `jit`/`shard_map`. Weights are f32; matmuls optionally run in
bf16 on the MXU via `compute_dtype` with f32 accumulation
(`preferred_element_type`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# A pytree: {"w": [W0, W1, ...], "b": [b0, b1, ...]}
MLPParams = dict


def init_mlp(
    key: jax.Array,
    sizes: Sequence[int],
    *,
    final_zeros: bool = False,
    scale: float = 1.0,
) -> MLPParams:
    """He-initialised MLP with layer sizes `sizes[0] -> ... -> sizes[-1]`.

    `final_zeros=True` zero-initialises the last layer — used for the s/t
    heads of couplings so every flow starts at the identity map (standard
    normalizing-flow practice; keeps early log-dets finite and training
    stable).
    """
    ws, bs = [], []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in = sizes[i]
        std = scale * (2.0 / fan_in) ** 0.5
        if final_zeros and i == len(keys) - 1:
            w = jnp.zeros((sizes[i], sizes[i + 1]), jnp.float32)
        else:
            w = std * jax.random.normal(k, (sizes[i], sizes[i + 1]), jnp.float32)
        ws.append(w)
        bs.append(jnp.zeros((sizes[i + 1],), jnp.float32))
    return {"w": ws, "b": bs}


def apply_mlp(
    params: MLPParams,
    x: jax.Array,
    *,
    activation=jax.nn.relu,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Apply the MLP along the last axis. Activation on all but final layer."""
    h = x
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = (
            jnp.dot(
                h.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        if i < n - 1:
            h = activation(h)
    return h
