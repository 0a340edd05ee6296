"""Layer-indexed matmul kernel: ``y = x @ W[idx]`` over stacked weights.

The while-loop dynamic-exit engine (eval/scan_policy.py) keeps decoder
weights STACKED with a leading layer dim (L, K, N) and selects one layer per
loop iteration.  Expressed as ``x @ dynamic_slice(W, i)``, XLA materializes
the sliced layer in HBM before the dot reads it back — doubling the HBM
traffic of what is a purely bandwidth-bound step (the activations are ~32
tokens; the weights are 10s of MB).  This kernel instead streams W[idx]
tile-by-tile HBM->VMEM straight into the MXU via the Pallas pipeline (the
grid's minor dimension gives automatic double-buffered prefetch), with the
layer index delivered as a scalar-prefetch argument so the DMA addresses are
known before the body runs.

Replaces the role of the reference's fused CUDA GEMMs in its per-layer loop
(mosaic_gpt_3b.py:397-449 runs cuBLAS per layer; the layer pointer indirection
is free on GPU — on TPU/XLA it is not, hence this kernel).

fp32 accumulation regardless of input dtype; output in x.dtype.
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


def _kernel(idx_ref, x_ref, w_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n"))
def _run(x, w, idx, block_k: int, block_n: int):
    m, kdim = x.shape
    _, _, n = w.shape
    nk = pl.cdiv(kdim, block_k)
    nn = pl.cdiv(n, block_n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # k is the minor (fastest) grid dim: the accumulator loop runs
        # innermost, and the pipeline prefetches the next W tile during
        # the current dot
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((m, block_k), lambda j, k, idx: (0, k)),
            pl.BlockSpec((1, block_k, block_n),
                         lambda j, k, idx: (idx[0], k, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, k, idx: (0, j)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
    )
    flops = 2 * m * kdim * n
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=kdim * n * w.dtype.itemsize + m * kdim * x.dtype.itemsize,
            transcendentals=0),
    )(idx.reshape(1).astype(jnp.int32), x, w)


def _xla_fallback(x, w, idx):
    wi = jax.lax.dynamic_index_in_dim(w, idx, axis=0, keepdims=False)
    return jnp.dot(x, wi.astype(x.dtype))


# ---------------------------------------------------------------------------
# weight-only int8 variant (ops/quant.py layout: q (L, K, N) int8,
# s (L, N) fp32 per-output-channel scales)
# ---------------------------------------------------------------------------


def _kernel_q8(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 tile -> compute dtype in VMEM (HBM only ever sees int8 bytes),
    # fp32 accumulation on the MXU
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[0].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0, 0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n"))
def _run_q8(x, wq, s, idx, block_k: int, block_n: int):
    m, kdim = x.shape
    nl, _, n = wq.shape
    nk = pl.cdiv(kdim, block_k)
    nn = pl.cdiv(n, block_n)
    # scales ride as (L, 1, N): every block dim is either 1 == the array dim
    # or a lane-aligned slice, satisfying the Mosaic block-shape rule
    s3 = s.reshape(nl, 1, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((m, block_k), lambda j, k, idx: (0, k)),
            pl.BlockSpec((1, block_k, block_n),
                         lambda j, k, idx: (idx[0], k, j)),
            pl.BlockSpec((1, 1, block_n), lambda j, k, idx: (idx[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, k, idx: (0, j)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_q8, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kdim * n,
            bytes_accessed=kdim * n + m * kdim * x.dtype.itemsize + n * 4,
            transcendentals=0),
    )(idx.reshape(1).astype(jnp.int32), x, wq, s3)


def _xla_fallback_q8(x, wq, s, idx):
    wi = jax.lax.dynamic_index_in_dim(wq, idx, axis=0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(s, idx, axis=0, keepdims=False)
    return jnp.dot(x, wi.astype(x.dtype)) * si.astype(x.dtype)


def indexed_matmul_q8(x: jnp.ndarray, wq: jnp.ndarray, s: jnp.ndarray, idx,
                      *, block_k: int = 1024, block_n: int = 512,
                      backend: Optional[str] = None) -> jnp.ndarray:
    """``(x (..., K) @ wq (L, K, N) [idx]) * s (L, N) [idx] -> (..., N)``
    with int8 weights: the layer's weight bytes stream HBM->VMEM as int8
    (half the bf16 kernel's traffic on a bandwidth-bound step), dequant
    happens on-chip fused with the dot."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    if backend != "pallas":
        return _xla_fallback_q8(x, wq, s, jnp.asarray(idx))
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]
    tile_m = 16 if x2.dtype == jnp.bfloat16 else 8
    mp = _round_up(m, tile_m)
    n = wq.shape[2]
    bk = min(block_k, kdim)
    bn = min(block_n, n)
    if kdim % bk or n % bn or kdim != wq.shape[1]:
        return _xla_fallback_q8(x, wq, s, jnp.asarray(idx))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    y = _run_q8(x2, wq, s.astype(jnp.float32), jnp.asarray(idx), bk, bn)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n)


# ---------------------------------------------------------------------------
# weight-only int4 variant (ops/quant.py quantize_weight4 layout:
# q4 (L, K/2, N) int8 nibble-packed — low nibbles = rows [0, K/2), high
# nibbles = rows [K/2, K) — s (L, N) fp32 per-output-channel scales)
# ---------------------------------------------------------------------------


def _kernel_q4(idx_ref, xa_ref, xb_ref, w_ref, s_ref, o_ref, acc_ref,
               *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # unpack both nibbles in int32 (arithmetic right-shift sign-extends),
    # then two MXU dots against the matching x halves: HBM only ever sees
    # the packed bytes — HALF the int8 kernel's weight traffic
    w32 = w_ref[0].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(xa_ref.dtype)
    hi = jnp.right_shift(w32, 4).astype(xa_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        xa_ref[...], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        xb_ref[...], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0, 0].astype(jnp.float32)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_kp", "block_n"))
def _run_q4(x, wq4, s, idx, block_kp: int, block_n: int):
    m, kdim = x.shape
    nl, kp, n = wq4.shape  # kp = kdim // 2 packed rows
    nk = pl.cdiv(kp, block_kp)
    nn = pl.cdiv(n, block_n)
    s3 = s.reshape(nl, 1, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nn, nk),
        in_specs=[
            # x twice: packed block k needs original rows [k*bkp, (k+1)*bkp)
            # (low nibbles) AND [kp + k*bkp, ...) (high nibbles) — the
            # halves-split packing keeps both fetches contiguous
            pl.BlockSpec((m, block_kp), lambda j, k, idx: (0, k)),
            pl.BlockSpec((m, block_kp), lambda j, k, idx: (0, nk + k)),
            pl.BlockSpec((1, block_kp, block_n),
                         lambda j, k, idx: (idx[0], k, j)),
            pl.BlockSpec((1, 1, block_n), lambda j, k, idx: (idx[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, k, idx: (0, j)),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_q4, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kdim * n,
            bytes_accessed=kp * n + 2 * m * kdim * x.dtype.itemsize + n * 4,
            transcendentals=0),
    )(idx.reshape(1).astype(jnp.int32), x, x, wq4, s3)


def _xla_fallback_q4(x, wq4, s, idx):
    from deer_vla_tpu.ops.quant import unpack_int4
    wi = jax.lax.dynamic_index_in_dim(wq4, idx, axis=0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(s, idx, axis=0, keepdims=False)
    return jnp.dot(x, unpack_int4(wi).astype(x.dtype)) * si.astype(x.dtype)


def indexed_matmul_q4(x: jnp.ndarray, wq4: jnp.ndarray, s: jnp.ndarray, idx,
                      *, block_kp: int = 512, block_n: int = 512,
                      backend: Optional[str] = None) -> jnp.ndarray:
    """``(x (..., K) @ unpack(wq4 (L, K/2, N))[idx]) * s (L, N)[idx]`` with
    nibble-packed int4 weights: the layer streams HBM->VMEM at HALF the int8
    bytes; both nibbles dequantize on-chip fused with two MXU dots (the
    activations are tiny on the bandwidth-bound B=1 step, so fetching x
    twice costs nothing)."""
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    if backend != "pallas":
        return _xla_fallback_q4(x, wq4, s, jnp.asarray(idx))
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]
    tile_m = 16 if x2.dtype == jnp.bfloat16 else 8
    mp = _round_up(m, tile_m)
    kp, n = wq4.shape[1], wq4.shape[2]
    bkp = min(block_kp, kp)
    bn = min(block_n, n)
    if kp % bkp or n % bn or kdim != 2 * kp:
        return _xla_fallback_q4(x, wq4, s, jnp.asarray(idx))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    y = _run_q4(x2, wq4, s.astype(jnp.float32), jnp.asarray(idx), bkp, bn)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n)


def indexed_matmul(x: jnp.ndarray, w: jnp.ndarray, idx,
                   *, block_k: int = 1024, block_n: int = 512,
                   backend: Optional[str] = None) -> jnp.ndarray:
    """``x (..., K) @ w (L, K, N) [idx] -> (..., N)``.

    idx may be a traced scalar (it is inside the while-loop engine).  The
    Pallas path runs on TPU; elsewhere (CPU tests) an XLA dynamic-slice
    fallback keeps semantics identical.
    """
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    if backend != "pallas":
        return _xla_fallback(x, w, jnp.asarray(idx))
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]
    # sublane alignment for the M dim (lane dim K/N are model dims, already
    # multiples of 128 for every real config; fall back if not)
    tile_m = 16 if x2.dtype == jnp.bfloat16 else 8
    mp = _round_up(m, tile_m)
    n = w.shape[2]
    bk = min(block_k, kdim)
    bn = min(block_n, n)
    if kdim % bk or n % bn or kdim != w.shape[1]:
        return _xla_fallback(x, w, jnp.asarray(idx))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    y = _run(x2, w, jnp.asarray(idx), bk, bn)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n)
