"""Fused attention kernel (Pallas/TPU) — the flash-attn replacement.

The reference leaned on external flash-attn/Triton CUDA kernels for the MPT
blocks (modeling_gpt_9b.py:12-45; mosaic_gpt_3b.py:72-75 torch/triton paths).
On TPU the sequences in this workload are short (text 32, perceiver latents
64/321 kv, ViT 257), so the optimal shape is NOT a KV-blocked flash loop but
a single fused block per (batch, head): Q@K^T, bias add, numerically-stable
softmax and P@V all in VMEM with fp32 accumulation — one HBM round trip for
q/k/v instead of the unfused logits/probs materialization.

Supports an optional additive bias broadcast over batch and/or head (covers
ALiBi+causal+padding for MPT and the media-location mask for gated x-attn).

Falls back (by raising, caught in ops.attention.dot_attention) for shapes
the kernel doesn't handle; parity vs the XLA path is tested to 2e-2 in bf16
and 2e-5 in fp32 (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
            sk_actual: int, sk_padded: int):
    q = q_ref[0, 0].astype(jnp.float32)            # (Sq, D)
    k = k_ref[0, 0].astype(jnp.float32)            # (Sk, D)
    v = v_ref[0, 0]                                # (Sk, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if sk_actual != sk_padded:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < sk_actual, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _run(q, k, v, bias, scale):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    tile = 16 if q.dtype == jnp.bfloat16 else 8
    sqp = _round_up(sq, tile)
    skp = _round_up(sk, tile)
    pad_q = [(0, 0), (0, 0), (0, sqp - sq), (0, 0)]
    pad_k = [(0, 0), (0, 0), (0, skp - sk), (0, 0)]
    qp = jnp.pad(q, pad_q) if sqp != sq else q
    kp = jnp.pad(k, pad_k) if skp != sk else k
    vp = jnp.pad(v, pad_k) if skp != sk else v

    in_specs = [
        pl.BlockSpec((1, 1, sqp, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skp, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skp, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        bb, bh = bias.shape[0], bias.shape[1]
        bp = jnp.pad(bias, [(0, 0), (0, 0), (0, sqp - sq), (0, skp - sk)]) \
            if (sqp != sq or skp != sk) else bias
        in_specs.append(pl.BlockSpec(
            (1, 1, sqp, skp),
            lambda i, j, bb=bb, bh=bh: (i if bb > 1 else 0,
                                        j if bh > 1 else 0, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(bp)
        kern = functools.partial(_kernel, scale=scale, sk_actual=sk,
                                 sk_padded=skp)
    else:
        def kern(q_ref, k_ref, v_ref, o_ref):
            _kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale,
                    sk_actual=sk, sk_padded=skp)

    out = pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, sqp, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
    )(*args)
    return out[:, :, :sq, :]


# shapes that fit comfortably in VMEM with this single-block strategy
_MAX_SEQ = 2048
_MAX_D = 256


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """(B, H, Sq, D) x (B, H, Sk, D) -> (B, H, Sq, D); bias broadcastable
    over (B, H)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if sq > _MAX_SEQ or sk > _MAX_SEQ or d > _MAX_D:
        raise ValueError("sequence too long for single-block fused attention")
    if bias is not None:
        # normalize bias rank to 4 and validate broadcastability
        while bias.ndim < 4:
            bias = bias[None]
        if bias.shape[2] != sq or bias.shape[3] != sk:
            raise ValueError("bias q/k dims must match")
        if bias.shape[0] not in (1, b) or bias.shape[1] not in (1, h):
            raise ValueError("bias batch/head dims must be 1 or full")
    return _run(q, k, v, bias, float(scale))
