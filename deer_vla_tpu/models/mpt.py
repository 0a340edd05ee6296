"""Truncated MPT decoder with interleaved gated cross-attention and
early-exit segmentation.

Reference: mosaic_gpt_3b.py (MPT-1B) / modeling_gpt_9b.py (MPT-7B) with the
FlamingoLayer wrapper (open_flamingo/src/flamingo_lm.py:6-83): each decoder
layer runs [optional gated x-attn] -> [MPT block], and DeeR collects the
*output* of every layer (mosaic_gpt_3b.py:424-427) as hidden_states[i].

MPT block = preLN attention (fused Wqkv, ALiBi bias, no biases anywhere when
no_bias) + preLN GELU MLP, residual both times.

TPU-first structure: instead of a Python `break` out of the layer loop
(mosaic_gpt_3b.py:438-443), the stack exposes
  * ``decoder_forward``          — all layers, stacked hidden states (training
                                   & calibration; one fused XLA program)
  * ``decoder_segment_forward``  — layers [start, stop): the unit of the
                                   exit-bucket programs used at inference.
Compute between exits is static; only the stop decision is dynamic, so each
bucket compiles once and the host (or a lax.cond chain) sequences buckets.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import DeerConfig, MPTConfig
from deer_vla_tpu.models.gated_xattn import gated_xattn_forward, init_gated_xattn
from deer_vla_tpu.ops.alibi import full_attn_bias
from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import (init_embedding, init_layernorm,
                                     init_linear, layernorm, linear,
                                     trunc_normal)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_mpt_block(key, cfg: MPTConfig, dtype=jnp.float32) -> dict:
    k = jax.random.split(key, 4)
    bias = not cfg.no_bias
    d = cfg.d_model
    p = {
        "ln_1": init_layernorm(d, bias=bias, dtype=dtype),
        "wqkv": init_linear(k[0], d, 3 * d, bias=bias, dtype=dtype, init="normal02"),
        "out_proj": init_linear(k[1], d, d, bias=bias, dtype=dtype, init="normal02"),
        "ln_2": init_layernorm(d, bias=bias, dtype=dtype),
        "mlp_up": init_linear(k[2], d, cfg.mlp_ratio * d, bias=bias, dtype=dtype,
                              init="normal02"),
        "mlp_down": init_linear(k[3], cfg.mlp_ratio * d, d, bias=bias, dtype=dtype,
                                init="normal02"),
    }
    if cfg.qk_ln:
        p["q_ln"] = init_layernorm(d, bias=bias, dtype=dtype)
        p["k_ln"] = init_layernorm(d, bias=bias, dtype=dtype)
    return p


def init_decoder(key, cfg: DeerConfig, dtype=jnp.float32) -> dict:
    """Full LM-side stack: wte + [xattn?, block] * n_layers + ln_f."""
    mpt = cfg.mpt
    keys = jax.random.split(key, 2 + 2 * mpt.n_layers)
    params = {
        "wte": {"w": trunc_normal(keys[0], (mpt.vocab_size, mpt.d_model), 0.02, dtype)},
        "ln_f": init_layernorm(mpt.d_model, bias=not mpt.no_bias, dtype=dtype),
        "blocks": [],
        "xattn": [],
    }
    if mpt.arch == "llama":
        # llama's LM side: RMSNorm final + UNTIED lm_head (lm_logits'
        # llama branch; the mpt path reuses ln_f + wte^T)
        from deer_vla_tpu.models.llama import init_rmsnorm
        params["norm_f"] = init_rmsnorm(mpt.d_model, dtype)
        params["lm_head_w"] = init_linear(keys[1], mpt.d_model,
                                          mpt.vocab_size, bias=False,
                                          dtype=dtype)
    for i in range(mpt.n_layers):
        if mpt.arch == "llama":
            from deer_vla_tpu.models.llama import init_llama_block
            params["blocks"].append(init_llama_block(keys[2 + 2 * i], mpt, dtype))
        else:
            params["blocks"].append(init_mpt_block(keys[2 + 2 * i], mpt, dtype))
        if cfg.has_xattn(i):
            params["xattn"].append(init_gated_xattn(
                keys[3 + 2 * i], mpt.d_model, cfg.vis_dim,
                dim_head=cfg.xattn_dim_head, heads=cfg.xattn_heads,
                ff_mult=cfg.xattn_ff_mult, dtype=dtype))
        else:
            params["xattn"].append(None)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def mpt_block_forward(p: dict, x: jnp.ndarray, attn_bias: jnp.ndarray,
                      cfg: MPTConfig) -> jnp.ndarray:
    h = layernorm(p["ln_1"], x)
    qkv = linear(p["wqkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if "q_ln" in p:
        q = layernorm(p["q_ln"], q)
        k = layernorm(p["k_ln"], k)
    q = split_heads(q, cfg.n_heads)
    k = split_heads(k, cfg.n_heads)
    v = split_heads(v, cfg.n_heads)
    attn = merge_heads(dot_attention(q, k, v, bias=attn_bias,
                                     scale=cfg.head_dim ** -0.5))
    x = x + linear(p["out_proj"], attn)
    h = layernorm(p["ln_2"], x)
    h = linear(p["mlp_down"], jax.nn.gelu(linear(p["mlp_up"], h), approximate=False))
    return x + h


def _sliced(tree, i):
    """Per-layer view of a stacked (L, ...) pytree — for SMALL leaves
    (layernorm scales, biases); big weights go through indexed_matmul."""
    return jax.tree_util.tree_map(
        lambda s: jax.lax.dynamic_index_in_dim(s, i, 0, keepdims=False), tree)


def mpt_block_forward_stacked(stacked: dict, i, x: jnp.ndarray,
                              attn_bias: jnp.ndarray, cfg: MPTConfig
                              ) -> jnp.ndarray:
    """mpt_block_forward over STACKED (L, ...) weights selected by a traced
    layer index — the while-loop engine's per-iteration body.

    The four big matmuls stream W[i] directly HBM->MXU via
    ops/pallas/indexed_matmul (no dynamic-slice materialization, halving the
    weight HBM traffic of the bandwidth-bound streaming step); layernorm
    scales/biases are tiny and sliced normally.
    """
    from deer_vla_tpu.ops.pallas.indexed_matmul import (indexed_matmul,
                                                        indexed_matmul_q4,
                                                        indexed_matmul_q8)

    def imm(p: dict, h):
        if "s8" in p:
            # w8a8 stack (ops/quant.py int8_w8a8): slice the layer and let
            # ops.layers.linear run the int8 MXU path (no pallas variant —
            # w8a8 targets batched serving, where indexed_mm is off)
            y = linear({"q": jax.lax.dynamic_index_in_dim(
                            p["q"], i, 0, keepdims=False),
                        "s8": jax.lax.dynamic_index_in_dim(
                            p["s8"], i, 0, keepdims=False)}, h)
        elif "s48" in p:
            # w4a8 stack (ops/quant.py int4_w8a8): slice the packed layer
            # (half the int8 bytes) and let ops.layers.linear run the
            # split-dot int8 MXU path — like w8a8 this targets batched
            # serving, where the step is compute-bound
            y = linear({"q4": jax.lax.dynamic_index_in_dim(
                            p["q4"], i, 0, keepdims=False),
                        "s48": jax.lax.dynamic_index_in_dim(
                            p["s48"], i, 0, keepdims=False)}, h)
        elif "q4" in p:  # weight-only int4 stack (ops/quant.py, packed)
            y = indexed_matmul_q4(h, p["q4"], p["s4"], i)
        elif "q" in p:  # weight-only int8 stack (ops/quant.py)
            y = indexed_matmul_q8(h, p["q"], p["s"], i)
        else:
            y = indexed_matmul(h, p["w"], i)
        if "b" in p and p["b"] is not None:
            y = y + jax.lax.dynamic_index_in_dim(
                p["b"], i, 0, keepdims=False).astype(y.dtype)
        return y

    h = layernorm(_sliced(stacked["ln_1"], i), x)
    qkv = imm(stacked["wqkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if "q_ln" in stacked:
        q = layernorm(_sliced(stacked["q_ln"], i), q)
        k = layernorm(_sliced(stacked["k_ln"], i), k)
    q = split_heads(q, cfg.n_heads)
    k = split_heads(k, cfg.n_heads)
    v = split_heads(v, cfg.n_heads)
    attn = merge_heads(dot_attention(q, k, v, bias=attn_bias,
                                     scale=cfg.head_dim ** -0.5))
    x = x + imm(stacked["out_proj"], attn)
    h = layernorm(_sliced(stacked["ln_2"], i), x)
    h = imm(stacked["mlp_down"],
            jax.nn.gelu(imm(stacked["mlp_up"], h), approximate=False))
    return x + h


def embed_tokens(params: dict, input_ids: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    return jnp.take(params["wte"]["w"].astype(compute_dtype), input_ids, axis=0)


def make_attn_bias(attention_mask: jnp.ndarray, cfg: MPTConfig,
                   dtype) -> jnp.ndarray:
    """(B, H|1, S, S) fused [ALiBi+]causal+padding bias
    (mosaic_gpt_3b.py:158-219); llama arch has no ALiBi."""
    s = attention_mask.shape[-1]
    if cfg.alibi and cfg.arch == "mpt":
        return full_attn_bias(attention_mask, cfg.n_heads, s,
                              cfg.alibi_bias_max, dtype)
    from deer_vla_tpu.ops.alibi import causal_padding_bias
    return causal_padding_bias(attention_mask, s, dtype)


def _layer(params: dict, i: int, x: jnp.ndarray, media: jnp.ndarray,
           media_locations: Optional[jnp.ndarray], attn_bias: jnp.ndarray,
           cfg: DeerConfig, text_time: Optional[jnp.ndarray]) -> jnp.ndarray:
    xp = params["xattn"][i]
    if xp is not None:
        x = gated_xattn_forward(
            xp, x, media, media_locations, heads=cfg.xattn_heads,
            dim_head=cfg.xattn_dim_head,
            only_attend_immediate_media=cfg.only_attend_immediate_media,
            text_time=text_time)
    if cfg.mpt.arch == "llama":
        from deer_vla_tpu.models.llama import llama_block_forward
        return llama_block_forward(params["blocks"][i], x, attn_bias, cfg.mpt)
    return mpt_block_forward(params["blocks"][i], x, attn_bias, cfg.mpt)


def decoder_forward(params: dict, input_ids: jnp.ndarray,
                    attention_mask: jnp.ndarray, media: jnp.ndarray,
                    cfg: DeerConfig,
                    media_locations: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run all layers; returns (hidden_states, x_final_preLN).

    hidden_states: (n_layers, B, S, D) — hidden_states[i] is the OUTPUT of
    layer i (the DeeR convention, mosaic_gpt_3b.py:424-427).  Note the exit
    heads consume these raw layer outputs; ln_f is NOT applied (the heads
    replaced lm_head and are fed hidden_states directly,
    flamingo_mpt.py:459,465).
    """
    cdt = cfg.dtypes.cdt
    x = embed_tokens(params, input_ids, cdt)
    if media_locations is None:
        media_locations = input_ids == cfg.media_token_id
    attn_bias = make_attn_bias(attention_mask, cfg.mpt, cdt)
    outs = []
    layer_fn = _layer
    if cfg.remat_layers:
        policy = None
        if cfg.remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        layer_fn = jax.checkpoint(_layer, static_argnums=(1, 6),
                                  policy=policy)
    for i in range(cfg.n_layers):
        x = layer_fn(params, i, x, media, media_locations, attn_bias, cfg, None)
        outs.append(x)
    return jnp.stack(outs, axis=0), x


def lm_logits(params: dict, hidden: jnp.ndarray, compute_dtype=None,
              arch: str = "mpt") -> jnp.ndarray:
    """Vocabulary logits from final hidden states.

    mpt: ln_f + tied wte^T (MPT ties input/output embeddings).
    llama: rmsnorm(norm_f) + UNTIED lm_head matrix (the BCFlamingo llama
    family's generate path, flamingo_bc.py:252-310).

    Unused by the DeeR action path (the action heads replaced lm_head) but
    required for the upstream OpenFlamingo LM-pretraining capability
    (open_flamingo/train/) and text generation."""
    if arch == "llama" and "norm_f" in params:
        from deer_vla_tpu.models.llama import rmsnorm
        h = rmsnorm(params["norm_f"], hidden)
        return linear(params["lm_head_w"], h)
    h = layernorm(params["ln_f"], hidden)
    w = params["wte"]["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
    return jnp.dot(h, w.T.astype(h.dtype))


def decoder_segment_forward(params: dict, x: jnp.ndarray,
                            attention_mask: jnp.ndarray, media: jnp.ndarray,
                            cfg: DeerConfig, start: int, stop: int,
                            media_locations: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run layers [start, stop) on pre-embedded input.

    Returns (x_prev, x): output of layer stop-2 (== input to the last layer,
    i.e. feats[i-1] needed for the first-exit pseudo-action,
    value_net.py:122-126) and output of layer stop-1.
    """
    attn_bias = make_attn_bias(attention_mask, cfg.mpt, x.dtype)
    x_prev = x
    for i in range(start, stop):
        x_prev = x
        x = _layer(params, i, x, media, media_locations, attn_bias, cfg, None)
    return x_prev, x
