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

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("axis",))
def _quantize_weight_fused(w, axis):
    """Jitted so the fp32 cast / abs / round fuse into streaming ops: the
    eager version materialized an fp32 copy of every leaf, which both OOMs
    on GB-scale stacked 9B leaves (fp32 temp ~2x the resident bf16 tree)
    and costs one tunnel round-trip PER OP on the axon platform."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=axis) / 127.0
    s = jnp.maximum(s, 1e-12)  # all-zero columns: keep scale finite
    q = jnp.clip(jnp.round(w32 / jnp.expand_dims(s, axis)), -127, 127)
    return q.astype(jnp.int8), s


def quantize_weight(w: jnp.ndarray, axis: int = -2):
    """Symmetric per-output-channel int8: reduce |max| over the contraction
    axis (default -2, the K dim of a (..., K, N) matmul weight).

    Returns (q int8 same shape, s fp32 shape-without-axis)."""
    return _quantize_weight_fused(w, axis)


def dequantize_weight(q: jnp.ndarray, s: jnp.ndarray, dtype=jnp.float32,
                      axis: int = -2) -> jnp.ndarray:
    return (q.astype(jnp.float32)
            * jnp.expand_dims(s, axis)).astype(dtype)


def quantize_weight4(w: jnp.ndarray):
    """Symmetric per-output-channel int4, nibble-packed two-per-byte.

    Packing layout is a HALVES split along the contraction axis: low nibbles
    hold rows [0, K/2), high nibbles rows [K/2, K) — so unpacking is a single
    sublane concat (no row interleave), which both the XLA fallback and the
    Pallas layer-indexed kernel (ops/pallas/indexed_matmul.indexed_matmul_q4)
    lower cheaply.  Values clip to [-7, 7] (s = max|w|/7; the -8 code is
    unused to keep the scale symmetric).

    Returns (q4 int8 (..., K/2, N) with two nibbles per byte,
             s fp32 (..., N)).  Requires even K (callers fall back to int8
    otherwise).  Error bound: |w - deq| <= s/2 per element — int4 is COARSE
    (16 levels); ship behind an opt-in flag and validate quality on real
    checkpoints.
    """
    k = w.shape[-2]
    assert k % 2 == 0, f"int4 packing needs an even contraction dim, got {k}"
    return _quantize_weight4_fused(w)


@jax.jit
def _quantize_weight4_fused(w):
    """Jitted for the same fusion/dispatch reasons as _quantize_weight_fused
    (the nibble pack adds two more elementwise passes eager mode would
    materialize)."""
    k = w.shape[-2]
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=-2) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w32 / jnp.expand_dims(s, -2)), -7, 7
                 ).astype(jnp.int8)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2:, :]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4),
                            jnp.bitwise_and(lo, 0x0F))
    return packed.astype(jnp.int8), s


def unpack_int4(q4: jnp.ndarray) -> jnp.ndarray:
    """(..., K/2, N) packed nibbles -> (..., K, N) int8 in [-7, 7] (halves
    layout, see quantize_weight4).  Shifts run in int32 — arithmetic
    right-shift sign-extends both nibbles."""
    w32 = q4.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def dequantize_weight4(q4: jnp.ndarray, s: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    return (unpack_int4(q4).astype(jnp.float32)
            * jnp.expand_dims(s, -2)).astype(dtype)


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
      "s4" — weight-only int4, nibble-packed (quantize_weight4): HALF the
             int8 weight bytes for the bandwidth-bound B=1 step; COARSE
             (16 levels) — opt-in, validate quality.  Odd-K weights fall
             back to int8 within the same tree.
      "s48" — w4a8: nibble-packed int4 weights AND dynamic per-row int8
             activations; the dot runs as TWO int8 x int8 -> int32 MXU
             dots against the activation halves (concat-free, see
             ops.layers.linear) — int4's weight-bandwidth win composed
             with w8a8's int8-MXU compute win.  Odd-K weights fall back
             to w8a8 (q + s8) within the same tree so activations stay
             int8 everywhere.

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
                if scale_key in ("s4", "s48") and v.shape[-2] % 2 == 0:
                    out["q4"], out[scale_key] = quantize_weight4(v)
                elif scale_key == "s4":  # odd K: int8 keeps the tree servable
                    out["q"], out["s"] = quantize_weight(v)
                elif scale_key == "s48":  # odd K: w8a8 keeps activations int8
                    out["q"], out["s8"] = quantize_weight(v)
                else:
                    out["q"], out[scale_key] = quantize_weight(v)
            else:
                out[k] = quantize_tree(v, min_dim, scale_key)
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree(v, min_dim, scale_key)
                          for v in tree)
    return tree


QUANT_MODES = ("int8", "int8_w8a8", "int4", "int4_w8a8")


SERVING_QUANT_PARTS = ("blocks", "xattn", "vit", "perceiver",
                       "perceiver_gripper")
# named subsets for selective quantization (the bench's mixed-precision
# decomposition; also usable as a deployment choice)
QUANT_PART_GROUPS = {
    "all": SERVING_QUANT_PARTS,
    "decoder": ("blocks", "xattn"),
    "vision": ("vit", "perceiver", "perceiver_gripper"),
}


def quantize_serving_stacked(stacked: dict, mode: Optional[str],
                             parts=SERVING_QUANT_PARTS) -> dict:
    """Quantize the weight-heavy stacked subtrees of a serving engine's
    packed tree (decoder blocks, gated x-attn, ViT blocks, perceiver
    layers).  Index maps / flags (has_xattn, xattn_idx) pass through.

    mode: None/"none" = no-op; "int8" = weight-only int8;
    "int8_w8a8" = int8 weights + dynamic int8 activations (int8 MXU);
    "int4" = weight-only nibble-packed int4 (coarse; opt-in);
    "int4_w8a8" = int4 weights + dynamic int8 activations (half w8a8's
    weight bytes on the int8 MXU; coarse like int4).

    parts: which subtrees to quantize — a tuple of subtree names or a
    QUANT_PART_GROUPS key ("all" default, "decoder", "vision").  Untouched
    subtrees keep their original (bf16/fp32) leaves, so e.g.
    parts="decoder" serves an int8-MXU decoder under a bf16 vision tower
    (the bench's per-precision MFU decomposition measures exactly these
    splits)."""
    if not mode or mode == "none":
        return stacked
    if mode not in QUANT_MODES:
        raise ValueError(f"unknown quantize mode {mode!r} "
                         f"(want one of {QUANT_MODES})")
    if isinstance(parts, str):
        if parts not in QUANT_PART_GROUPS:
            raise ValueError(f"unknown parts group {parts!r} "
                             f"(want one of {tuple(QUANT_PART_GROUPS)})")
        parts = QUANT_PART_GROUPS[parts]
    unknown = set(parts) - set(SERVING_QUANT_PARTS)
    if unknown:
        raise ValueError(f"unknown stacked subtrees {sorted(unknown)} "
                         f"(want among {SERVING_QUANT_PARTS})")
    scale_key = {"int8_w8a8": "s8", "int4": "s4",
                 "int4_w8a8": "s48"}.get(mode, "s")
    out = dict(stacked)
    for k in parts:
        if k in out:
            out[k] = quantize_tree(out[k], scale_key=scale_key)
    return out


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))
