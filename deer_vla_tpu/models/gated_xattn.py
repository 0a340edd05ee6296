"""Gated cross-attention block — port of open_flamingo/src/helpers.py:136-279.

Semantics preserved:
  * media (B, T_img, n, D_vis) flattened to (B, T_img*n) keys
  * media-location masking: text token at position i may attend to media t
    iff cumsum(media_locations)[i] == t+1 (only_attend_immediate_media) or
    >= t+1 otherwise (helpers.py:196-218)
  * with immediate-media masking, text with no preceding media gets its
    attention output zeroed (helpers.py:223-229)
  * tanh-gated residuals with gates initialized to 0 (helpers.py:255-258)
  * all projections bias-free.

``use_cached_media`` (helpers.py:199-205) is represented by passing
``text_time`` explicitly — callers give cumsum(media_locations) normally or a
constant count for cached-media decoding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deer_vla_tpu.ops.attention import dot_attention
from deer_vla_tpu.ops.layers import init_layernorm, init_linear, layernorm, linear
from deer_vla_tpu.models.perceiver import ff_forward, init_ff

NEG_INF = -1e9  # torch uses finfo.max; any large negative is equivalent post-softmax


def init_gated_xattn(key, dim: int, dim_visual: int, dim_head: int = 64,
                     heads: int = 8, ff_mult: int = 4, dtype=jnp.float32) -> dict:
    k = jax.random.split(key, 4)
    inner = dim_head * heads
    return {
        "norm": init_layernorm(dim, dtype=dtype),
        "to_q": init_linear(k[0], dim, inner, bias=False, dtype=dtype),
        "to_kv": init_linear(k[1], dim_visual, 2 * inner, bias=False, dtype=dtype),
        "to_out": init_linear(k[2], inner, dim, bias=False, dtype=dtype),
        "attn_gate": jnp.zeros((1,), dtype),
        "ff": init_ff(k[3], dim, ff_mult, dtype=dtype),
        "ff_gate": jnp.zeros((1,), dtype),
    }


def masked_cross_attention(p: dict, x: jnp.ndarray, media: jnp.ndarray,
                           media_locations: Optional[jnp.ndarray],
                           *, heads: int, dim_head: int,
                           only_attend_immediate_media: bool = True,
                           text_time: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, T_txt, D); media: (B, T_img, n, D_vis)."""
    b, t_txt, _ = x.shape
    _, t_img, n_media, _ = media.shape

    h = layernorm(p["norm"], x)
    q = linear(p["to_q"], h)
    media_f = media.reshape(b, t_img * n_media, media.shape[-1])
    k, v = jnp.split(linear(p["to_kv"], media_f), 2, axis=-1)

    def to_heads(t):
        bb, s, _ = t.shape
        return t.reshape(bb, s, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)

    bias = None
    zero_out = None
    if media_locations is not None or text_time is not None:
        if text_time is None:
            text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)  # (B, T_txt)
        media_time = jnp.arange(1, t_img + 1)  # (T_img,)
        media_time = jnp.repeat(media_time, n_media)  # (T_img*n,)
        if only_attend_immediate_media:
            allowed = text_time[:, :, None] == media_time[None, None, :]
            zero_out = (text_time == 0)  # (B, T_txt)
        else:
            allowed = text_time[:, :, None] >= media_time[None, None, :]
        bias = jnp.where(allowed, 0.0, NEG_INF)[:, None, :, :]  # (B,1,Tt,Ti*n)

    out = dot_attention(q, k, v, bias=bias, scale=dim_head ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, t_txt, heads * dim_head)
    if zero_out is not None:
        out = jnp.where(zero_out[:, :, None], 0.0, out)
    return linear(p["to_out"], out)


def gated_xattn_forward(p: dict, x: jnp.ndarray, media: jnp.ndarray,
                        media_locations: Optional[jnp.ndarray],
                        *, heads: int = 8, dim_head: int = 64,
                        only_attend_immediate_media: bool = True,
                        text_time: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    attn = masked_cross_attention(
        p, x, media, media_locations, heads=heads, dim_head=dim_head,
        only_attend_immediate_media=only_attend_immediate_media,
        text_time=text_time)
    x = attn * jnp.tanh(p["attn_gate"].astype(x.dtype)) + x
    x = ff_forward(p["ff"], x) * jnp.tanh(p["ff_gate"].astype(x.dtype)) + x
    return x
