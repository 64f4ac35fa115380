"""MLP primitive.

Parity target: the reference's `mlp.py` Mlp class [SURVEY §2.1 C2] — a stack
of dense layers with xavier(glorot-uniform) kernel init, zero bias init, ReLU
hidden activations and a linear (or configured) output activation.  Depth-k
means k dense layers; hidden widths equal the input dim, output width is the
target dim (SURVEY §2.3 step 1).

Params are plain pytrees (list of {"w","b"} dicts) so the NumPy oracle can
consume them unchanged.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def mlp_init(key, layer_sizes: Sequence[int], dtype=jnp.float32) -> List[dict]:
    """layer_sizes = [in, h1, ..., out]; returns list of {"w": [i,o], "b": [o]}."""
    params = []
    keys = jax.random.split(key, len(layer_sizes) - 1)
    for k, i, o in zip(keys, layer_sizes[:-1], layer_sizes[1:]):
        params.append({
            "w": glorot_uniform(k, (i, o), dtype),
            "b": jnp.zeros((o,), dtype),
        })
    return params


def mlp_sizes(in_dim: int, out_dim: int, depth: int) -> List[int]:
    """Reference Mlp sizing: depth dense layers, hidden = in_dim, last = out_dim."""
    return [in_dim] * depth + [out_dim]


def mlp_apply(
    params: List[dict],
    x: jnp.ndarray,
    hidden_activation: Callable = jax.nn.relu,
    output_activation: Optional[Callable] = None,
) -> jnp.ndarray:
    n = len(params)
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=x.dtype) + layer["b"]
        if i < n - 1:
            x = hidden_activation(x)
        elif output_activation is not None:
            x = output_activation(x)
    return x
