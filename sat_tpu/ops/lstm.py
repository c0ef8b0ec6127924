"""Multi-layer LSTM cell math as pure jnp functions.

TPU-native replacement for the reference's cuDNN ``nn.LSTM`` (reference:
model.py:175-180).  The reference always feeds a single timestep (seq_len=1,
model.py:301/326, 541/544), so the natural TPU formulation is an explicit cell
rolled with ``lax.scan`` — XLA fuses the two matmuls + gate nonlinearities onto
the MXU/VPU, and the fused Pallas decoder-step kernel reuses this exact layout.

Weight layout per layer (row-major for ``x @ W``):
  w_ih: (input_dim, 4*hidden)   w_hh: (hidden, 4*hidden)
  b_ih: (4*hidden,)             b_hh: (4*hidden,)
Gate order matches torch: [i, f, g, o].
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def init_lstm_params(rng: jax.Array, input_dim: int, hidden_dim: int,
                     num_layers: int, dtype=jnp.float32) -> Dict[str, Dict[str, jax.Array]]:
    """torch nn.LSTM init: U(-1/sqrt(H), 1/sqrt(H)) for every weight and bias.

    Layers keyed "layer_<i>" (dict, not list, for msgpack checkpoint round-trips)."""
    k = 1.0 / math.sqrt(hidden_dim)
    layers = {}
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden_dim
        rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
        layers[f"layer_{layer}"] = {
            "w_ih": jax.random.uniform(r1, (in_dim, 4 * hidden_dim), dtype, -k, k),
            "w_hh": jax.random.uniform(r2, (hidden_dim, 4 * hidden_dim), dtype, -k, k),
            "b_ih": jax.random.uniform(r3, (4 * hidden_dim,), dtype, -k, k),
            "b_hh": jax.random.uniform(r4, (4 * hidden_dim,), dtype, -k, k),
        }
    return layers


def lstm_cell(x: jax.Array, h: jax.Array, c: jax.Array,
              p: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """One LSTM cell update. x: (B, in), h/c: (B, H) -> (h', c')."""
    gates = (jnp.dot(x, p["w_ih"], preferred_element_type=jnp.float32)
             + jnp.dot(h, p["w_hh"], preferred_element_type=jnp.float32)
             + p["b_ih"] + p["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


def lstm_stack_step(x: jax.Array, h: jax.Array, c: jax.Array,
                    layers: Dict[str, Dict[str, jax.Array]]) -> Tuple[jax.Array, jax.Array]:
    """Single-timestep update of a multi-layer LSTM.

    x: (B, in); h, c: (num_layers, B, H).  Returns new (h, c).
    Matches torch semantics: layer l's input is layer l-1's new hidden output.
    """
    new_h, new_c = [], []
    inp = x
    for l in range(len(layers)):
        p = layers[f"layer_{l}"]
        hl, cl = lstm_cell(inp, h[l], c[l], p)
        new_h.append(hl)
        new_c.append(cl)
        inp = hl
    return jnp.stack(new_h), jnp.stack(new_c)
