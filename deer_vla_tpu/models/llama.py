"""Llama decoder block — the BCFlamingo / RoboFlamingo-legacy LM substrate.

The reference selects BCFlamingo when the LM is a llama
(robot_flamingo/models/factory.py:161-162, flamingo_bc.py:10-531); that path
has no early-exit support (SURVEY §2.1) but is part of the public surface.
Block: RMSNorm -> RoPE attention (optional GQA) -> residual -> RMSNorm ->
SwiGLU MLP -> residual.  No biases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import MPTConfig
from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import init_linear, linear


def init_rmsnorm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(dt)


def rope_tables(seq_len: int, head_dim: int, theta: float = 10000.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2) / head_dim))
    t = jnp.arange(seq_len)[:, None] * inv[None, :]
    return jnp.cos(t), jnp.sin(t)  # (S, D/2)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, S, D); rotate pairs (x0,x1),(x2,x3)..."""
    d = x.shape[-1]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, None].astype(x.dtype)
    s = sin[None, None].astype(x.dtype)
    r1 = x1 * c - x2 * s
    r2 = x1 * s + x2 * c
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


def init_llama_block(key, cfg: MPTConfig, dtype=jnp.float32) -> dict:
    k = jax.random.split(key, 7)
    d = cfg.d_model
    inner = int(d * 8 / 3)
    inner = 256 * ((inner + 255) // 256)  # llama ffn rounding
    return {
        "attn_norm": init_rmsnorm(d, dtype),
        "wq": init_linear(k[0], d, d, bias=False, dtype=dtype, init="normal02"),
        "wk": init_linear(k[1], d, d, bias=False, dtype=dtype, init="normal02"),
        "wv": init_linear(k[2], d, d, bias=False, dtype=dtype, init="normal02"),
        "wo": init_linear(k[3], d, d, bias=False, dtype=dtype, init="normal02"),
        "mlp_norm": init_rmsnorm(d, dtype),
        "w_gate": init_linear(k[4], d, inner, bias=False, dtype=dtype, init="normal02"),
        "w_up": init_linear(k[5], d, inner, bias=False, dtype=dtype, init="normal02"),
        "w_down": init_linear(k[6], inner, d, bias=False, dtype=dtype, init="normal02"),
    }


def llama_block_forward(p: dict, x: jnp.ndarray, attn_bias: jnp.ndarray,
                        cfg: MPTConfig,
                        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                        ) -> jnp.ndarray:
    h = rmsnorm(p["attn_norm"], x)
    q = split_heads(linear(p["wq"], h), cfg.n_heads)
    k = split_heads(linear(p["wk"], h), cfg.n_heads)
    v = split_heads(linear(p["wv"], h), cfg.n_heads)
    if rope is None:
        rope = rope_tables(x.shape[1], cfg.head_dim)
    q = apply_rope(q, *rope)
    k = apply_rope(k, *rope)
    attn = merge_heads(dot_attention(q, k, v, bias=attn_bias,
                                     scale=cfg.head_dim ** -0.5))
    x = x + linear(p["wo"], attn)
    h = rmsnorm(p["mlp_norm"], x)
    h = linear(p["w_down"], jax.nn.silu(linear(p["w_gate"], h)) * linear(p["w_up"], h))
    return x + h
