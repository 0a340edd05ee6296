"""Weight-only int8 quantization for serving param trees.

The B=1 streaming step is weight-HBM-bound: per action the decoder reads
every layer's matmul weights against ~32 activation rows (arithmetic
intensity far below the MXU roofline), so weight bytes ARE the step time.
Symmetric per-output-channel int8 halves the bf16 weight traffic; the
dequant (int8->bf16 cast + per-column scale) fuses into the consuming dot,
so no dequantized copy ever lands in HBM.

The reference has no quantized serving path at all (its eval runs the
fp32/bf16 torch stack, eval_calvin.py:543-577); this is TPU-native
deployment surface beyond parity.

Representation: a quantized linear param dict carries ``q`` (int8, the
shape the fp weight had) and ``s`` (fp32 per-output-channel scale, the
weight shape minus the contraction axis) instead of ``w``.  ``ops.layers
.linear`` and the stacked-decoder matmul paths (models/mpt.py imm,
ops/pallas/indexed_matmul_q8) consume both layouts; slicing a stacked
``{"q": (L, K, N), "s": (L, N)}`` tree per layer yields exactly the 2-D
layout ``linear`` expects, so lax.scan / while_loop engines work unchanged.

Quantization error: |w - q*s| <= s/2 elementwise (round-to-nearest), with
s = max|w[..., :, n]| / 127 per column — tested in tests/test_quant.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = -2):
    """Symmetric per-output-channel int8: reduce |max| over the contraction
    axis (default -2, the K dim of a (..., K, N) matmul weight).

    Returns (q int8 same shape, s fp32 shape-without-axis)."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=axis) / 127.0
    s = jnp.maximum(s, 1e-12)  # all-zero columns: keep scale finite
    q = jnp.clip(jnp.round(w32 / jnp.expand_dims(s, axis)), -127, 127)
    return q.astype(jnp.int8), s


def dequantize_weight(q: jnp.ndarray, s: jnp.ndarray, dtype=jnp.float32,
                      axis: int = -2) -> jnp.ndarray:
    return (q.astype(jnp.float32)
            * jnp.expand_dims(s, axis)).astype(dtype)


def quantize_tree(tree, min_dim: int = 1, scale_key: str = "s"):
    """Replace every ``{"w": <matmul weight>}`` entry in a (nested) param
    tree with ``{"q", <scale_key>}``.  Only floating leaves under the key
    ``"w"`` with ndim >= 2 and both trailing dims >= min_dim are touched;
    biases, layernorm params, gates, and anything not named ``w`` pass
    through.

    scale_key selects the CONSUMPTION mode in ops.layers.linear:
      "s"  — weight-only int8 (dequant fused into the dot, fp activations)
      "s8" — w8a8: activations dynamically quantized per row and the dot
             runs int8 x int8 -> int32 on the MXU (2x bf16 MXU throughput
             on v5e; for COMPUTE-bound batched serving — weight-only
             already saturates the bandwidth-bound B=1 step)

    Intended for the serving engines' STACKED layer trees
    (eval/scan_policy.stack_decoder_layers output), which contain ONLY
    weights consumed via ops.layers.linear / models/mpt.imm — never apply
    it to trees holding embedding tables (wte) or patch_embed, whose
    consumers read ``p["w"]`` directly."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if (k == "w" and hasattr(v, "ndim") and v.ndim >= 2
                    and jnp.issubdtype(v.dtype, jnp.floating)
                    and v.shape[-1] >= min_dim and v.shape[-2] >= min_dim):
                out["q"], out[scale_key] = quantize_weight(v)
            else:
                out[k] = quantize_tree(v, min_dim, scale_key)
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree(v, min_dim, scale_key)
                          for v in tree)
    return tree


QUANT_MODES = ("int8", "int8_w8a8")


def quantize_serving_stacked(stacked: dict, mode: Optional[str]) -> dict:
    """Quantize the weight-heavy stacked subtrees of a serving engine's
    packed tree (decoder blocks, gated x-attn, ViT blocks, perceiver
    layers).  Index maps / flags (has_xattn, xattn_idx) pass through.

    mode: None/"none" = no-op; "int8" = weight-only int8;
    "int8_w8a8" = int8 weights + dynamic int8 activations (int8 MXU)."""
    if not mode or mode == "none":
        return stacked
    if mode not in QUANT_MODES:
        raise ValueError(f"unknown quantize mode {mode!r} "
                         f"(want one of {QUANT_MODES})")
    scale_key = "s8" if mode == "int8_w8a8" else "s"
    out = dict(stacked)
    for k in ("blocks", "xattn", "vit", "perceiver", "perceiver_gripper"):
        if k in out:
            out[k] = quantize_tree(out[k], scale_key=scale_key)
    return out


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))
