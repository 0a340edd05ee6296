"""CLIP ViT visual tower (open_clip "ViT-L-14"), TPU-native.

The reference loads this through open_clip with ``output_tokens=True``
(robot_flamingo/models/factory.py:109-114) and feeds the *un-projected*
per-patch tokens after the final LayerNorm to the perceiver
(flamingo_mpt.py:580: ``vision_encoder.visual(vision_x)[1]``).

TPU design notes:
  * patch embedding is a (B, P, c*ph*pw) x (c*ph*pw, width) matmul — the
    stride-14 conv reshaped so it runs on the MXU with no Conv lowering.
    Weight layout matches ``torch_conv_w.reshape(width, -1).T`` for direct
    checkpoint conversion.
  * attention uses ops.attention.dot_attention (pallas flash kernel on TPU).
  * the whole tower is bf16 under jit; LayerNorm stats in fp32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import ViTConfig
from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import (init_layernorm, init_linear, layernorm,
                                     linear, quick_gelu, trunc_normal)


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 6 + cfg.layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    scale = cfg.width ** -0.5
    params = {
        "patch_embed": {"w": trunc_normal(keys[0], (patch_dim, cfg.width), 0.02, dtype)},
        "class_embedding": scale * jax.random.normal(keys[1], (cfg.width,), dtype),
        "positional_embedding": scale * jax.random.normal(
            keys[2], (cfg.seq_len, cfg.width), dtype),
        "ln_pre": init_layernorm(cfg.width, dtype=dtype),
        "ln_post": init_layernorm(cfg.width, dtype=dtype),
        "blocks": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[6 + i], 6)
        params["blocks"].append({
            "ln_1": init_layernorm(cfg.width, dtype=dtype),
            "ln_2": init_layernorm(cfg.width, dtype=dtype),
            "qkv": init_linear(k[0], cfg.width, 3 * cfg.width, bias=True, dtype=dtype),
            "out": init_linear(k[1], cfg.width, cfg.width, bias=True, dtype=dtype),
            "mlp_fc": init_linear(k[2], cfg.width, int(cfg.width * cfg.mlp_ratio),
                                  bias=True, dtype=dtype),
            "mlp_proj": init_linear(k[3], int(cfg.width * cfg.mlp_ratio), cfg.width,
                                    bias=True, dtype=dtype),
        })
    return params


def _patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, P, 3*patch*patch), flatten order (c, ph, pw)
    matching torch's conv-weight reshape."""
    b, c, h, w = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, c, ph, pw)
    return x.reshape(b, gh * gw, c * patch * patch)


def _block(p: dict, x: jnp.ndarray, heads: int, act) -> jnp.ndarray:
    h = layernorm(p["ln_1"], x)
    qkv = linear(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, heads) for t in (q, k, v))
    attn = merge_heads(dot_attention(q, k, v))
    x = x + linear(p["out"], attn)
    h = layernorm(p["ln_2"], x)
    h = linear(p["mlp_proj"], act(linear(p["mlp_fc"], h)))
    return x + h


def resize_pos_embed(pos: jnp.ndarray, new_patches: int) -> jnp.ndarray:
    """(1+P0, D) learned position table -> (1+P, D) by bilinear grid
    interpolation (CLS row kept) — the standard ViT variable-resolution
    trick.  Lets the shared CLIP tower run the gripper camera at its NATIVE
    84x84 (cfg.gripper_res) instead of the reference's mandatory 224
    upsample (its open_clip preprocess resizes every camera to 224,
    robot_flamingo/models/factory.py:109-114).  Static shapes: resolved at
    trace time, so each resolution is its own compiled program."""
    p0 = pos.shape[0] - 1
    g0 = int(round(p0 ** 0.5))
    g1 = int(round(new_patches ** 0.5))
    assert g0 * g0 == p0 and g1 * g1 == new_patches, (p0, new_patches)
    grid = pos[1:].reshape(g0, g0, pos.shape[-1]).astype(jnp.float32)
    grid = jax.image.resize(grid, (g1, g1, pos.shape[-1]), method="linear")
    return jnp.concatenate(
        [pos[:1], grid.reshape(g1 * g1, pos.shape[-1]).astype(pos.dtype)], 0)


def _prologue(params: dict, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    b = x.shape[0]
    assert x.shape[-1] % cfg.patch_size == 0, \
        f"input {x.shape[-1]} not a multiple of patch {cfg.patch_size}"
    h = jnp.dot(_patchify(x, cfg.patch_size), params["patch_embed"]["w"].astype(x.dtype))
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype), (b, 1, cfg.width))
    h = jnp.concatenate([cls, h], axis=1)
    pos = params["positional_embedding"]
    if pos.shape[0] != h.shape[1]:
        # variable-resolution input (native-res gripper camera): interpolate
        # the position table to this grid (negligible: one (16,16,D) resize
        # fused into the prologue)
        pos = resize_pos_embed(pos, h.shape[1] - 1)
    h = h + pos.astype(x.dtype)
    return layernorm(params["ln_pre"], h)


def vit_forward(params: dict, x: jnp.ndarray, cfg: ViTConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, 3, H, W) preprocessed images.

    Returns (pooled_pre_proj, tokens): tokens (B, P, width) are the
    per-patch features after ln_post — exactly open_clip's
    ``output_tokens=True`` second output that DeeR consumes.
    """
    h = _prologue(params, x, cfg)
    act = quick_gelu if cfg.use_quick_gelu else jax.nn.gelu
    for blk in params["blocks"]:
        h = _block(blk, h, cfg.heads, act)
    h = layernorm(params["ln_post"], h)
    return h[:, 0], h[:, 1:]


def _block_tome(p: dict, x: jnp.ndarray, sizes: jnp.ndarray, heads: int,
                act, r: int, any_merged: bool):
    """One ViT block with ToMe merging between attention and MLP
    (ops/tome.py).  x: (B, 1+n, D) with CLS at 0; sizes: (B, n) patch-token
    multiplicities.  Returns (x', sizes') with n' = n - r.  ``any_merged``
    is a STATIC flag: until the first merge all sizes are exactly 1 and the
    proportional-attention bias (log 1 = 0) is skipped, keeping the
    pre-merge layers bit-identical to the exact tower."""
    from deer_vla_tpu.ops.tome import bipartite_merge, proportional_attn_bias

    h = layernorm(p["ln_1"], x)
    qkv = linear(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, heads) for t in (q, k, v))
    bias = None
    if any_merged:
        ones = jnp.ones_like(sizes[:, :1])
        bias = proportional_attn_bias(
            jnp.concatenate([ones, sizes], axis=1), x.shape[1])
    attn = merge_heads(dot_attention(q, k, v, bias=bias))
    x = x + linear(p["out"], attn)
    if r > 0:
        metric = k.mean(axis=1)  # (B, 1+n, head_dim): mean attention keys
        patches, sizes = bipartite_merge(x[:, 1:], metric[:, 1:], sizes, r)
        x = jnp.concatenate([x[:, :1], patches], axis=1)
    h = layernorm(p["ln_2"], x)
    h = linear(p["mlp_proj"], act(linear(p["mlp_fc"], h)))
    return x + h, sizes


def vit_forward_tome(params: dict, x: jnp.ndarray, cfg: ViTConfig,
                     stacked_blocks: dict = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vit_forward with ToMe token merging (cfg.tome_r per layer; see
    ops/tome.py for the design and the quality caveat).  The layer loop is
    UNROLLED — the token count shrinks per layer, so shapes are per-layer
    static and lax.scan cannot apply; with ``stacked_blocks`` the packed
    serving pytree is sliced per layer (argument-leaf count stays low, see
    stack_vit_blocks).  Returns (pooled_CLS, tokens) like vit_forward, with
    tokens (B, P - sum(schedule), width)."""
    from deer_vla_tpu.ops.tome import tome_schedule

    h = _prologue(params, x, cfg)
    act = quick_gelu if cfg.use_quick_gelu else jax.nn.gelu
    schedule = tome_schedule(cfg.num_patches, cfg.layers, cfg.tome_r)
    sizes = jnp.ones(h.shape[:1] + (cfg.num_patches,), jnp.float32)
    any_merged = False
    for i in range(cfg.layers):
        blk = (params["blocks"][i] if stacked_blocks is None
               else jax.tree.map(lambda a: a[i], stacked_blocks))
        h, sizes = _block_tome(blk, h, sizes, cfg.heads, act, schedule[i],
                               any_merged)
        any_merged = any_merged or schedule[i] > 0
    h = layernorm(params["ln_post"], h)
    return h[:, 0], h[:, 1:]


def stack_vit_blocks(params: dict, dtype=None) -> dict:
    """blocks list -> one pytree with leading L dim (serving path).

    Collapses 24 x ~14 argument leaves to ~14: per-program dispatch cost on
    this runtime grows ~1 us/leaf (scripts/bench_dispatch_args.py), so the
    streaming policy packs encoder weights.  Bit-identical to the list path
    (see ops.layers.stack_layer_tree for the dtype rule)."""
    from deer_vla_tpu.ops.layers import stack_layer_tree
    return stack_layer_tree(params["blocks"], dtype)


def vit_forward_stacked(params: dict, stacked_blocks: dict, x: jnp.ndarray,
                        cfg: ViTConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vit_forward with the layer loop as a lax.scan over stacked weights;
    same math in the same order (params supplies the non-block leaves)."""
    h = _prologue(params, x, cfg)
    act = quick_gelu if cfg.use_quick_gelu else jax.nn.gelu

    def body(h, blk):
        return _block(blk, h, cfg.heads, act), None

    h, _ = jax.lax.scan(body, h, stacked_blocks)
    h = layernorm(params["ln_post"], h)
    return h[:, 0], h[:, 1:]
