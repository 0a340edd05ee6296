"""ALiBi attention bias for the MPT decoder.

Reference behavior: mosaic_gpt_3b.py:158-219 builds a (1, H, 1, S) bias once
(`attn_bias`) from llm-foundry's ``build_alibi_bias`` and merges the padding
mask into it with -inf fill.  Because the decoder is causal and softmax is
shift-invariant per query row, the per-key bias ``(j - S + 1) * slope`` is
equivalent to the textbook ``-(i - j) * slope`` on the causal triangle.

We reproduce the llm-foundry slope schedule exactly (power-of-two rounding +
interleave for non-pow2 head counts) so converted MPT weights are bit-faithful.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> np.ndarray:
    """llm-foundry gen_slopes: slopes_i = 2^(-alibi_bias_max * i / ceilpow2(H))."""
    _n = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, _n + 1, dtype=np.float32) * (alibi_bias_max / _n)
    slopes = 1.0 / np.power(2.0, m)
    if _n != n_heads:
        # interleave odd/even and truncate, per llm-foundry
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes.astype(np.float32)


def alibi_bias(n_heads: int, seq_len: int, alibi_bias_max: float = 8.0,
               dtype=jnp.float32) -> jnp.ndarray:
    """(1, H, 1, S) per-key bias: (j - S + 1) * slope_h  (<= 0)."""
    slopes = jnp.asarray(alibi_slopes(n_heads, alibi_bias_max))  # (H,)
    pos = jnp.arange(1 - seq_len, 1, dtype=jnp.float32)  # (S,)
    bias = pos[None, :] * slopes[:, None]  # (H, S)
    return bias[None, :, None, :].astype(dtype)


def causal_padding_bias(attention_mask: jnp.ndarray, seq_len: int,
                        dtype=jnp.float32, neg: float = -1e9) -> jnp.ndarray:
    """(B, 1, S, S) additive bias combining the causal triangle and key-side
    padding (mosaic_gpt_3b.py:201-217 merges the padding mask into attn_bias;
    causality is applied inside the attention module)."""
    causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    allowed = causal[None, :, :] & attention_mask[:, None, :].astype(bool)
    return jnp.where(allowed, 0.0, neg).astype(dtype)[:, None, :, :]


def full_attn_bias(attention_mask: jnp.ndarray, n_heads: int, seq_len: int,
                   alibi_bias_max: float = 8.0, dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, S, S) = alibi + causal + padding, ready for one fused add."""
    return (alibi_bias(n_heads, seq_len, alibi_bias_max, dtype)
            + causal_padding_bias(attention_mask, seq_len, dtype))
