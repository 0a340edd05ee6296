"""Pallas flash-attention parity (interpreter mode on CPU; the real-TPU
compile path is exercised by bench.py on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.ops.attention import _xla_attention


def run_pallas_interpret(q, k, v, bias, scale):
    from jax.experimental.pallas import tpu as pltpu
    from deer_vla_tpu.ops.pallas import flash_attention as fa
    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(q, k, v, bias=bias, scale=scale)


@pytest.mark.parametrize("shape,has_bias", [
    ((2, 4, 32, 16), True),    # MPT-like (alibi+causal bias)
    ((2, 4, 257, 64), False),  # ViT-like (no bias, unaligned seq)
    ((2, 2, 64, 32), True),    # perceiver-like with kv longer than q
])
def test_flash_attention_parity(shape, has_bias):
    b, h, sq, d = shape
    sk = sq + 15 if shape[2] == 64 else sq
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(b, h, sq, d), jnp.float32)
    k = jnp.asarray(r.randn(b, h, sk, d), jnp.float32)
    v = jnp.asarray(r.randn(b, h, sk, d), jnp.float32)
    bias = jnp.asarray(r.randn(b, 1, sq, sk) * 2, jnp.float32) if has_bias else None
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, bias, scale)
    out = run_pallas_interpret(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_bias_head_broadcast():
    r = np.random.RandomState(1)
    b, h, s, d = 2, 4, 24, 16
    q = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    bias_full = jnp.asarray(np.broadcast_to(r.randn(1, h, s, s), (b, h, s, s)),
                            jnp.float32)
    ref = _xla_attention(q, k, v, bias_full, d ** -0.5)
    out = run_pallas_interpret(q, k, v, bias_full[:1], d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_rejects_oversize():
    from deer_vla_tpu.ops.pallas import flash_attention as fa
    q = jnp.zeros((1, 1, 4096, 64))
    with pytest.raises(ValueError):
        fa.flash_attention(q, q, q)


@pytest.mark.parametrize("m,kdim,n,blk", [
    (32, 256, 384, (128, 128)),   # multi k/n tiles
    (7, 256, 128, (256, 128)),    # M padding (sublane alignment)
    (16, 512, 256, (512, 256)),   # single k tile
])
def test_indexed_matmul_parity(m, kdim, n, blk):
    from jax.experimental.pallas import tpu as pltpu
    from deer_vla_tpu.ops.pallas.indexed_matmul import indexed_matmul
    r = np.random.RandomState(0)
    L = 3
    x = jnp.asarray(r.randn(m, kdim), jnp.float32)
    w = jnp.asarray(r.randn(L, kdim, n), jnp.float32)
    for idx in range(L):
        ref = np.asarray(x) @ np.asarray(w[idx])
        with pltpu.force_tpu_interpret_mode():
            out = indexed_matmul(x, w, idx, block_k=blk[0], block_n=blk[1],
                                 backend="pallas")
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-4)
        out_xla = indexed_matmul(x, w, jnp.int32(idx), backend="xla")
        np.testing.assert_allclose(np.asarray(out_xla), ref, rtol=2e-5,
                                   atol=2e-4)


def test_indexed_matmul_traced_idx_under_while():
    """The while-loop engine passes a traced layer index; the kernel's
    scalar-prefetch path must accept it (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from deer_vla_tpu.ops.pallas.indexed_matmul import indexed_matmul
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(16, 128), jnp.float32)
    w = jnp.asarray(r.randn(4, 128, 128), jnp.float32)

    def body(state):
        i, acc = state
        with pltpu.force_tpu_interpret_mode():
            y = indexed_matmul(x, w, i, backend="pallas")
        return i + 1, acc + y.sum()

    _, total = jax.lax.while_loop(lambda s: s[0] < 4, body,
                                  (jnp.int32(0), jnp.float32(0)))
    ref = sum(float((np.asarray(x) @ np.asarray(w[i])).sum())
              for i in range(4))
    np.testing.assert_allclose(float(total), ref, rtol=1e-4)


@pytest.mark.parametrize("m,kdim,n,blk", [
    (32, 256, 384, (64, 128)),    # multi packed-k/n tiles
    (7, 256, 128, (128, 128)),    # M padding + single packed-k tile
])
def test_indexed_matmul_q4_parity(m, kdim, n, blk):
    """int4 kernel (nibble-packed, two-x-tile accumulation) vs the XLA
    unpack fallback vs the dequantized dense product."""
    from jax.experimental.pallas import tpu as pltpu
    from deer_vla_tpu.ops.pallas.indexed_matmul import indexed_matmul_q4
    from deer_vla_tpu.ops.quant import dequantize_weight4, quantize_weight4
    r = np.random.RandomState(3)
    L = 3
    x = jnp.asarray(r.randn(m, kdim), jnp.float32)
    w = jnp.asarray(r.randn(L, kdim, n), jnp.float32)
    q4, s = quantize_weight4(w)
    for idx in range(L):
        ref = np.asarray(x) @ np.asarray(dequantize_weight4(q4[idx], s[idx]))
        with pltpu.force_tpu_interpret_mode():
            out = indexed_matmul_q4(x, q4, s, idx, block_kp=blk[0],
                                    block_n=blk[1], backend="pallas")
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-4)
        out_xla = indexed_matmul_q4(x, q4, s, jnp.int32(idx), backend="xla")
        np.testing.assert_allclose(np.asarray(out_xla), ref, rtol=2e-5,
                                   atol=2e-4)
