"""Primitive layers as pure functions over param pytrees.

Convention: every layer has ``init_*(key, ...) -> params`` returning a dict of
jnp arrays, and an apply function taking ``(params, x, ...)``.  Parameters are
stored in ``param_dtype`` and cast to ``compute_dtype`` at the callsite via
:func:`cast_tree`; layernorms always accumulate statistics in fp32 (the
reference uses MPT's low-precision layernorm which downcasts weights but
normalizes in the input dtype; on TPU fp32 stats are free and strictly more
accurate).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming_uniform with a=sqrt(5)) for
    (in, out)-shaped weights: gain = sqrt(2/(1+5)) = 1/sqrt(3), bound =
    sqrt(3) * gain / sqrt(fan_in) = 1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def lecun_normal(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    return jax.random.normal(key, shape, dtype) * (1.0 / math.sqrt(fan_in))


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32, init="torch") -> dict:
    wkey, bkey = jax.random.split(key)
    if init == "torch":
        w = kaiming_uniform(wkey, (in_dim, out_dim), dtype)
    elif init == "normal02":
        w = trunc_normal(wkey, (in_dim, out_dim), 0.02, dtype)
    else:
        w = lecun_normal(wkey, (in_dim, out_dim), dtype)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return p


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "s8" in p:
        # w8a8 (ops/quant.py int8_w8a8): dynamic symmetric per-row
        # activation int8 + per-output-channel weight int8; the dot runs
        # int8 x int8 -> int32 on the MXU (2x bf16 MXU throughput on
        # v5e — the lever for COMPUTE-bound batched serving; weight-only
        # int8 covers the bandwidth-bound B=1 step).  fp32 rescale by
        # sx * sw fuses into the epilogue.
        sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                     keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xi, p["q"], (((xi.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx
             * p["s8"].astype(jnp.float32)).astype(x.dtype)
    elif "s48" in p:
        # w4a8 (ops/quant.py int4_w8a8): nibble-packed int4 weights +
        # dynamic per-row int8 activations.  Both nibbles unpack to int8 in
        # VMEM and the product is TWO int8 x int8 -> int32 MXU dots against
        # the matching activation halves (the halves-split packing keeps
        # each nibble a contiguous K/2 row block, so no concat ever
        # materializes the unpacked weight): half w8a8's weight HBM bytes
        # at the same int8 MXU throughput (2x bf16 on v5e).  The per-row
        # activation scale is shared across both halves, so the int32
        # accumulators add exactly; fp32 rescale by sx * s48 rides the
        # epilogue.
        kp = p["q4"].shape[-2]
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
                         / 127.0, 1e-12)
        xi = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        w32 = p["q4"].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(jnp.int8)
        hi = jnp.right_shift(w32, 4).astype(jnp.int8)
        dn = (((xi.ndim - 1,), (0,)), ((), ()))
        acc = (jax.lax.dot_general(xi[..., :kp], lo, dn,
                                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(xi[..., kp:], hi, dn,
                                     preferred_element_type=jnp.int32))
        y = (acc.astype(jnp.float32) * sx
             * p["s48"].astype(jnp.float32)).astype(x.dtype)
    elif "q4" in p:
        # weight-only int4 (ops/quant.py quantize_weight4): nibble-packed
        # two rows per byte — HALF the int8 weight bytes.  Concat-free
        # unpack: the halves-split packing makes each nibble a contiguous
        # K/2 row block, so the product is two dots against the matching x
        # halves (an unpack+concat would materialize the full int8 weight
        # and forfeit the bandwidth saving); the per-column scale rides the
        # epilogue like int8.
        kp = p["q4"].shape[-2]
        w32 = p["q4"].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(x.dtype)
        hi = jnp.right_shift(w32, 4).astype(x.dtype)
        y = ((jnp.dot(x[..., :kp], lo) + jnp.dot(x[..., kp:], hi))
             * p["s4"].astype(x.dtype))
    elif "q" in p:
        # weight-only int8 (ops/quant.py): the int8->compute-dtype cast and
        # the per-output-channel scale both fuse into the dot, so the
        # weight's HBM traffic is the int8 bytes.  (x @ q) * s == x @ (q*s)
        # exactly for per-column s, and keeps the dequant out of HBM.
        y = jnp.dot(x, p["q"].astype(x.dtype)) * p["s"].astype(x.dtype)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# layernorm
# ---------------------------------------------------------------------------


def init_layernorm(dim: int, bias: bool = True, dtype=jnp.float32) -> dict:
    p = {"scale": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def layernorm(p: Optional[dict], x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics, output in input dtype."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32)
        if "bias" in p and p["bias"] is not None:
            y = y + p["bias"].astype(jnp.float32)
    return y.astype(dt)


# ---------------------------------------------------------------------------
# embedding
# ---------------------------------------------------------------------------


def init_embedding(key, num: int, dim: int, std=0.02, dtype=jnp.float32) -> dict:
    return {"w": trunc_normal(key, (num, dim), std, dtype)}


def embedding(p: dict, ids: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w = p["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
    return jnp.take(w, ids, axis=0)


# ---------------------------------------------------------------------------
# MLP variants
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_mlp(key, dims: Sequence[int], bias: bool = True, dtype=jnp.float32) -> list:
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, dims[i], dims[i + 1], bias=bias, dtype=dtype)
            for i, k in enumerate(keys)]


def mlp_relu(ps: list, x: jnp.ndarray, *, ln_params: Optional[list] = None,
             final_act=None) -> jnp.ndarray:
    """Stack of Linear(+LayerNorm)+ReLU with a final Linear(+final_act).

    Mirrors MLPTanhHead / MLPSigmoidHead (action_head.py:82-269): hidden
    layers use ReLU (optionally LayerNorm before ReLU); the output layer
    applies ``final_act``.  Dropout is handled by the caller (train-only).
    """
    n = len(ps)
    for i, p in enumerate(ps):
        x = linear(p, x)
        if i < n - 1:
            if ln_params is not None and ln_params[i] is not None:
                x = layernorm(ln_params[i], x)
            x = jax.nn.relu(x)
        elif final_act is not None:
            x = final_act(x)
    return x


# ---------------------------------------------------------------------------
# dtype casting helpers
# ---------------------------------------------------------------------------


def cast_tree(tree, dtype):
    """Cast every floating-point leaf to ``dtype`` (ints untouched)."""
    def _cast(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size"))


# ---------------------------------------------------------------------------
# layer stacking (serving argument-tree packing)
# ---------------------------------------------------------------------------


def stack_layer_tree(layers, dtype=None):
    """List of per-layer param dicts -> one pytree with a leading L dim.

    dtype pre-casts MATMUL weights (pre-stack ndim >= 2) to the compute
    dtype — numerically identical to the unpacked path, where ``linear``
    casts weights to x.dtype at use.  1-D leaves (LayerNorm scales/biases,
    linear biases) keep their original dtype: ``layernorm`` consumes its
    params in fp32, so pre-rounding them to bf16 would break the packed ==
    unpacked bit-identity guarantee.
    """
    def stack(*xs):
        s = jnp.stack(xs)
        if (dtype is not None and xs[0].ndim >= 2
                and jnp.issubdtype(s.dtype, jnp.floating)):
            s = s.astype(dtype)
        return s

    return jax.tree_util.tree_map(stack, *layers)
