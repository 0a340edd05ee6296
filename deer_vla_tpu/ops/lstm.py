"""Multi-layer (LayerNorm-)LSTM as a `lax.scan` over time.

TPU-native replacement for the cuDNN ``nn.LSTM`` used by the action heads
(action_head.py:66-79) and the LayerNormLSTM variant (action_head.py:15-64).

Semantics preserved exactly:
  * gate order [i, f, g, o] (torch convention — weight converters rely on it)
  * ``LayerNormLSTM`` applies LayerNorm to each layer's *output sequence*
    (the recurrent carry itself is un-normalized, action_head.py:55-56)
  * inter-layer dropout between LSTM layers only (not after the last)
  * streaming single-step mode is the same function with T=1 and an explicit
    carry — replaces the stateful ``hidden_state`` / ``tmp_hidden_state``
    commit protocol (action_head.py:491-497,548-558) with functional carries.

Carry layout: (h, c) each of shape (num_layers, B, H).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.ops.layers import init_layernorm, layernorm

Carry = Tuple[jnp.ndarray, jnp.ndarray]


def init_lstm(key, in_dim: int, hidden: int, num_layers: int,
              use_layernorm: bool = False, dtype=jnp.float32) -> dict:
    layers = []
    for i in range(num_layers):
        key, k1, k2 = jax.random.split(key, 3)
        d_in = in_dim if i == 0 else hidden
        # torch initializes all LSTM params U(-1/sqrt(H), 1/sqrt(H))
        bound_shape_fix = hidden  # fan used by torch is hidden_size
        wi = jax.random.uniform(k1, (d_in, 4 * hidden), dtype,
                                -1.0 / bound_shape_fix ** 0.5, 1.0 / bound_shape_fix ** 0.5)
        wh = jax.random.uniform(k2, (hidden, 4 * hidden), dtype,
                                -1.0 / bound_shape_fix ** 0.5, 1.0 / bound_shape_fix ** 0.5)
        key, k3, k4 = jax.random.split(key, 3)
        bi = jax.random.uniform(k3, (4 * hidden,), dtype,
                                -1.0 / bound_shape_fix ** 0.5, 1.0 / bound_shape_fix ** 0.5)
        bh = jax.random.uniform(k4, (4 * hidden,), dtype,
                                -1.0 / bound_shape_fix ** 0.5, 1.0 / bound_shape_fix ** 0.5)
        layer = {"wi": wi, "wh": wh, "bi": bi, "bh": bh}
        if use_layernorm:
            layer["ln"] = init_layernorm(hidden, dtype=dtype)
        layers.append(layer)
    return {"layers": layers}


def zero_carry(num_layers: int, batch: int, hidden: int, dtype=jnp.float32) -> Carry:
    z = jnp.zeros((num_layers, batch, hidden), dtype)
    return (z, z)


def _cell_step(p: dict, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One LSTM cell step for a whole batch. x_t: (B, Din); h,c: (B, H)."""
    gates = (jnp.dot(x_t, p["wi"].astype(x_t.dtype))
             + jnp.dot(h, p["wh"].astype(x_t.dtype))
             + (p["bi"] + p["bh"]).astype(x_t.dtype))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_forward(params: dict, x: jnp.ndarray, carry: Optional[Carry] = None,
                 *, dropout_rate: float = 0.0, dropout_rng=None,
                 train: bool = False) -> Tuple[jnp.ndarray, Carry]:
    """Run the full stack over a sequence.

    Args:
      x: (B, T, Din)
      carry: optional (h, c) each (L, B, H); zeros if None.
    Returns:
      y: (B, T, H) output of the top layer, new carry (L, B, H) x2.
    """
    layers = params["layers"]
    num_layers = len(layers)
    b = x.shape[0]
    hdim = layers[0]["wh"].shape[0]
    if carry is None:
        carry = zero_carry(num_layers, b, hdim, x.dtype)
    h0, c0 = carry

    new_h, new_c = [], []
    for li, lp in enumerate(layers):
        def step(hc, x_t, lp=lp):
            h, c = hc
            h2, c2 = _cell_step(lp, x_t, h, c)
            return (h2, c2), h2

        (h_f, c_f), ys = jax.lax.scan(
            step, (h0[li].astype(x.dtype), c0[li].astype(x.dtype)),
            jnp.swapaxes(x, 0, 1))
        x = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if "ln" in lp:
            x = layernorm(lp["ln"], x)
        if train and dropout_rate > 0.0 and li < num_layers - 1 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
        new_h.append(h_f)
        new_c.append(c_f)

    return x, (jnp.stack(new_h), jnp.stack(new_c))


def lstm_step(params: dict, x_t: jnp.ndarray, carry: Carry) -> Tuple[jnp.ndarray, Carry]:
    """Single streaming step. x_t: (B, Din) -> (B, H), new carry.

    Equivalent to lstm_forward(x[:, None]) but without the scan overhead —
    this is the rollout hot path (one env step at a time)."""
    layers = params["layers"]
    h0, c0 = carry
    new_h, new_c = [], []
    x = x_t
    for li, lp in enumerate(layers):
        h2, c2 = _cell_step(lp, x, h0[li].astype(x.dtype), c0[li].astype(x.dtype))
        x = h2
        if "ln" in lp:
            x = layernorm(lp["ln"], x)
        new_h.append(h2)
        new_c.append(c2)
    return x, (jnp.stack(new_h), jnp.stack(new_c))
