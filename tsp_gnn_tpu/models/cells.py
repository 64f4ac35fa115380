"""LayerNorm-LSTM cell with TF1 `LayerNormBasicLSTMCell` semantics.

Parity target: the recurrent cell the reference's graphnn.py instantiates per
node type [SURVEY §2.3].  Exact semantics reproduced (all load-bearing for the
allclose contract):

  * single linear on concat([inputs, h]) with NO bias,
  * split into (i, j, f, o) in that gate order,
  * each of the four pre-activations layer-normalised INDEPENDENTLY with a
    learned per-gate gain/shift (tf.contrib.layers.layer_norm: center+scale,
    variance epsilon 1e-12),
  * new_c = c * sigmoid(f + forget_bias[=1.0]) + sigmoid(i) * act(j),
  * new_h = act(LN(new_c)) * sigmoid(o)   — note the extra LayerNorm on the
    cell state before the output activation,
  * `act` is the configurable Cell_activation (relu by default in the typed-
    GNN lineage; tanh selectable — SURVEY §2.3 flags this as [K-med]).

Params are plain pytrees so the NumPy oracle consumes them unchanged.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from tsp_gnn_tpu.models.mlp import glorot_uniform

LN_EPS = 1e-12
GATES = ("i", "j", "f", "o", "c")  # four gates + the cell-state LN


def lstm_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    """Kernel [in+h, 4h] (no bias) + 5 LayerNorm (gain, shift) pairs."""
    params = {
        "kernel": glorot_uniform(key, (input_dim + hidden_dim, 4 * hidden_dim), dtype)
    }
    for g in GATES:
        params[f"ln_{g}"] = {
            "g": jnp.ones((hidden_dim,), dtype),
            "b": jnp.zeros((hidden_dim,), dtype),
        }
    return params


def layer_norm(x: jnp.ndarray, gain: jnp.ndarray, shift: jnp.ndarray,
               eps: float = LN_EPS) -> jnp.ndarray:
    """Always normalises in f32 (bf16 statistics are too coarse; no-op for
    f32 inputs) and casts back to the compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps) * gain.astype(jnp.float32)
           + shift.astype(jnp.float32))
    return out.astype(x.dtype)


def lstm_apply(
    params: dict,
    inputs: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    activation: Callable = jax.nn.relu,
    forget_bias: float = 1.0,
    ln_eps: float = LN_EPS,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One cell step.  state = (c, h); returns (new_h, (new_c, new_h))."""
    c, h = state
    z = jnp.dot(jnp.concatenate([inputs, h], axis=-1), params["kernel"],
                preferred_element_type=inputs.dtype)
    i, j, f, o = jnp.split(z, 4, axis=-1)
    i = layer_norm(i, params["ln_i"]["g"], params["ln_i"]["b"], ln_eps)
    j = layer_norm(j, params["ln_j"]["g"], params["ln_j"]["b"], ln_eps)
    f = layer_norm(f, params["ln_f"]["g"], params["ln_f"]["b"], ln_eps)
    o = layer_norm(o, params["ln_o"]["g"], params["ln_o"]["b"], ln_eps)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * activation(j)
    ln_c = layer_norm(new_c, params["ln_c"]["g"], params["ln_c"]["b"], ln_eps)
    new_h = activation(ln_c) * jax.nn.sigmoid(o)
    return new_h, (new_c, new_h)


def get_activation(name: str) -> Callable:
    return {"relu": jax.nn.relu, "tanh": jnp.tanh}[name]
