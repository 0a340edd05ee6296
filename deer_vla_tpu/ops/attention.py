"""Core scaled-dot-product attention.

One implementation serves the ViT self-attention, the MPT decoder
self-attention (with ALiBi+causal+padding bias), the perceiver attention and
the gated cross-attention — they differ only in projections and bias, which
live in the model files.

Two backends:
  * ``xla``   — einsum + fp32 softmax; XLA fuses this well for the short
                sequences in this workload (text<=32, media 128, ViT 257).
  * ``pallas`` — fused flash-style kernel (ops/pallas/flash_attention.py)
                for the ViT/perceiver hot path on real TPUs.

The reference relied on external flash-attn/Triton kernels
(modeling_gpt_9b.py:12-45, mosaic_gpt_3b.py:72-75); this module is the
TPU-native replacement.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("DEER_ATTN_BACKEND", "auto")


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "xla", "pallas")
    _BACKEND = name


def _resolve_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  scale: Optional[float] = None) -> jnp.ndarray:
    """Attention over (B, H, Sq, Dh) x (B, H, Sk, Dh) -> (B, H, Sq, Dh).

    ``bias`` broadcasts against (B, H, Sq, Sk).  Softmax in fp32 with the
    max-subtraction trick (matches helpers.py:60,220 stability behavior).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = _resolve_backend()
    # the fused kernel pays off on ViT-scale blocks; for tiny decoder/x-attn
    # shapes (text<=32 q tokens) XLA's fusion is already optimal and the
    # kernel's per-(b,h) grid granularity just adds overhead
    if backend == "pallas" and q.shape[-2] >= 128:
        try:
            from deer_vla_tpu.ops.pallas.flash_attention import flash_attention
            return flash_attention(q, k, v, bias=bias, scale=scale)
        except Exception:
            pass  # fall through to XLA (e.g. unsupported shape)
    return _xla_attention(q, k, v, bias, scale)


def _xla_attention(q, k, v, bias, scale):
    dt = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = logits - jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, S, H*D) -> (B, H, S, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, D) -> (B, S, H*D)"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
