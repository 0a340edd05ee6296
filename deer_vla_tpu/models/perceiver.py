"""Perceiver resampler — TPU-native port of open_flamingo/src/helpers.py:25-132.

Math preserved exactly (fp32 parity tested against an independent numpy
replica of the reference equations):
  * q from latents, k/v from concat(media_tokens, latents) on the token dim
  * q pre-scaled by dim_head**-0.5, softmax with detached max subtraction
  * all projections bias-free; FeedForward = LN -> Linear -> GELU -> Linear
  * residual latents after both attn and ff; final LayerNorm.

The time dimension T is folded into the batch for attention (each frame is
resampled independently, helpers.py:107-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import PerceiverConfig
from deer_vla_tpu.ops.attention import dot_attention
from deer_vla_tpu.ops.layers import (init_layernorm, init_linear, layernorm,
                                     linear)


def init_ff(key, dim: int, mult: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {
        "ln": init_layernorm(dim, dtype=dtype),
        "fc1": init_linear(k1, dim, inner, bias=False, dtype=dtype),
        "fc2": init_linear(k2, inner, dim, bias=False, dtype=dtype),
    }


def ff_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = layernorm(p["ln"], x)
    # torch nn.GELU() default is the exact (erf) formulation
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))


def init_perceiver(key, cfg: PerceiverConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 2 + cfg.depth)
    inner = cfg.inner_dim
    params = {
        "latents": jax.random.normal(keys[0], (cfg.num_latents, cfg.dim), dtype),
        "norm": init_layernorm(cfg.dim, dtype=dtype),
        "layers": [],
    }
    for i in range(cfg.depth):
        k = jax.random.split(keys[2 + i], 4)
        params["layers"].append({
            "norm_media": init_layernorm(cfg.dim, dtype=dtype),
            "norm_latents": init_layernorm(cfg.dim, dtype=dtype),
            "to_q": init_linear(k[0], cfg.dim, inner, bias=False, dtype=dtype),
            "to_kv": init_linear(k[1], cfg.dim, 2 * inner, bias=False, dtype=dtype),
            "to_out": init_linear(k[2], inner, cfg.dim, bias=False, dtype=dtype),
            "ff": init_ff(k[3], cfg.dim, cfg.ff_mult, dtype=dtype),
        })
    return params


def _perceiver_attn(p: dict, x: jnp.ndarray, latents: jnp.ndarray,
                    cfg: PerceiverConfig) -> jnp.ndarray:
    """x: (B, v, D) media tokens; latents: (B, n, D)."""
    xm = layernorm(p["norm_media"], x)
    lt = layernorm(p["norm_latents"], latents)
    q = linear(p["to_q"], lt)
    kv_in = jnp.concatenate([xm, lt], axis=-2)  # (B, v+n, D)
    k, v = jnp.split(linear(p["to_kv"], kv_in), 2, axis=-1)

    def heads(t):
        b, s, _ = t.shape
        return t.reshape(b, s, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)

    out = dot_attention(heads(q), heads(k), heads(v), scale=cfg.dim_head ** -0.5)
    b, h, n, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return linear(p["to_out"], out)


def perceiver_forward(params: dict, x: jnp.ndarray, cfg: PerceiverConfig) -> jnp.ndarray:
    """x: (B, T, F, v, D) image features -> (B, T, num_latents, D)."""
    b, t, f, v, d = x.shape
    x = x.reshape(b * t, f * v, d)
    latents = jnp.broadcast_to(
        params["latents"].astype(x.dtype), (b * t, cfg.num_latents, d))
    for layer in params["layers"]:
        latents = _perceiver_attn(layer, x, latents, cfg) + latents
        latents = ff_forward(layer["ff"], latents) + latents
    latents = layernorm(params["norm"], latents)
    return latents.reshape(b, t, cfg.num_latents, d)


def stack_perceiver_layers(params: dict, dtype=None) -> dict:
    """layers list -> one pytree with leading depth dim (serving path; see
    vit.stack_vit_blocks for the dispatch-leaf-count rationale and
    ops.layers.stack_layer_tree for the dtype rule)."""
    from deer_vla_tpu.ops.layers import stack_layer_tree
    return stack_layer_tree(params["layers"], dtype)


def perceiver_forward_stacked(params: dict, stacked_layers: dict,
                              x: jnp.ndarray, cfg: PerceiverConfig) -> jnp.ndarray:
    """perceiver_forward with the depth loop as a lax.scan over stacked
    weights; identical math (params supplies latents + final norm)."""
    b, t, f, v, d = x.shape
    x = x.reshape(b * t, f * v, d)
    latents = jnp.broadcast_to(
        params["latents"].astype(x.dtype), (b * t, cfg.num_latents, d))

    def body(lat, layer):
        lat = _perceiver_attn(layer, x, lat, cfg) + lat
        lat = ff_forward(layer["ff"], lat) + lat
        return lat, None

    latents, _ = jax.lax.scan(body, latents, stacked_layers)
    latents = layernorm(params["norm"], latents)
    return latents.reshape(b, t, cfg.num_latents, d)
