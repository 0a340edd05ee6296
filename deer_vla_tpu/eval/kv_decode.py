"""KV-cached greedy decoding for the VL harness.

The plain generator (eval/vl_eval.make_greedy_generate) re-runs the full
decoder over the whole (S + T_new) buffer at every step — the right call
for tiny CALVIN-style prompts (S <= 32), but O(T_new · (S+T_new)^2 · L)
attention work once few-shot prompts grow.  This module is the TPU-native
KV-cache path: ONE prefill program computes every prompt position's K/V
per layer into static (L, B, H, T, Dh) buffers, then a ``lax.scan`` decode
loop attends each new token against the cache — per-token cost O((S+T)·L),
static shapes throughout, one compile per (buffer, new-token) geometry.

Design notes (TPU-first):
  - ALiBi's per-key form ``(j - S + 1) * slope`` (ops/alibi.py) is
    query-position independent under softmax shift-invariance, so cached
    decode reuses ONE (1, H, 1, T) bias row — no per-row query-distance
    math.
  - causality falls out of the running validity mask: a buffer position is
    attendable iff it has been written (prompt or already-generated), which
    is exactly the ``mask`` array the buffer protocol already threads.
  - the per-layer math calls the same primitives as models/mpt.py
    (layernorm / linear / split_heads / dot_attention);
    tests/test_kv_decode.py pins cached logits == full-recompute logits so
    the two paths cannot drift.
  - media cross-attention needs no cache: a generated token's media-time is
    the row's total media count (every <image> precedes the prompt end),
    passed via ``text_time``.

llama-arch models (RoPE applies rotations at absolute positions inside the
block) stay on the recompute engine; `supports_kv_cache` gates the switch.

Reference: the upstream harness leans on HF generate's ``use_cache``
KV caching inside its eval models (open_flamingo/eval/models/
open_flamingo.py get_outputs); here the cache is explicit and compiled.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import encode_vision
from deer_vla_tpu.models.gated_xattn import gated_xattn_forward
from deer_vla_tpu.models.mpt import (embed_tokens, lm_logits, make_attn_bias)
from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import layernorm, linear


def supports_kv_cache(cfg: DeerConfig) -> bool:
    return cfg.mpt.arch == "mpt"


def _mpt_qkv(p: dict, h: jnp.ndarray, cfg: DeerConfig):
    """Shared QKV projection (+ optional qk_ln) of models/mpt.py
    mpt_block_forward:104-109 — one definition for prefill and decode."""
    qkv = linear(p["wqkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if "q_ln" in p:
        q = layernorm(p["q_ln"], q)
        k = layernorm(p["k_ln"], k)
    n = cfg.mpt.n_heads
    return split_heads(q, n), split_heads(k, n), split_heads(v, n)


def _block_prefill(p: dict, x: jnp.ndarray, attn_bias: jnp.ndarray,
                   cfg: DeerConfig):
    """mpt_block_forward that also returns this layer's (k, v)."""
    h = layernorm(p["ln_1"], x)
    q, k, v = _mpt_qkv(p, h, cfg)
    attn = merge_heads(dot_attention(q, k, v, bias=attn_bias,
                                     scale=cfg.mpt.head_dim ** -0.5))
    x = x + linear(p["out_proj"], attn)
    h = layernorm(p["ln_2"], x)
    h = linear(p["mlp_down"], jax.nn.gelu(linear(p["mlp_up"], h),
                                          approximate=False))
    return x + h, k, v


def _block_decode(p: dict, x_t: jnp.ndarray, ck, cv, rows, pos_c, bias,
                  cfg: DeerConfig):
    """One-token block step: project the token's q/k/v once, write its k/v
    into the cache at its position, attend against the full cache.
    x_t: (B, 1, D); ck/cv: (B, H, T, Dh); bias: (B, H|1, 1, T).
    Returns (x_out, ck, cv)."""
    h = layernorm(p["ln_1"], x_t)
    q, k, v = _mpt_qkv(p, h, cfg)
    ck = ck.at[rows, :, pos_c].set(k[:, :, 0])
    cv = cv.at[rows, :, pos_c].set(v[:, :, 0])
    attn = merge_heads(dot_attention(q, ck, cv, bias=bias,
                                     scale=cfg.mpt.head_dim ** -0.5))
    x_t = x_t + linear(p["out_proj"], attn)
    h = layernorm(p["ln_2"], x_t)
    h = linear(p["mlp_down"], jax.nn.gelu(linear(p["mlp_up"], h),
                                          approximate=False))
    return x_t + h, ck, cv


def _alibi_key_bias(cfg: DeerConfig, total: int, dtype):
    """(1, H, 1, T) per-key ALiBi row (query-independent; see module doc)."""
    if not (cfg.mpt.alibi and cfg.mpt.arch == "mpt"):
        return None
    from deer_vla_tpu.ops.alibi import alibi_bias
    return alibi_bias(cfg.mpt.n_heads, total, cfg.mpt.alibi_bias_max, dtype)


@_functools.lru_cache(maxsize=16)
def make_cached_generate(cfg: DeerConfig, n_new: int):
    """Cached jitted generate(params, vision_x, ids, mask, start_lens) with
    the SAME buffer protocol as eval/vl_eval.make_greedy_generate: ids is a
    (B, total) right-padded prompt buffer; each row decodes greedily from
    its own prompt length; returns the filled ids buffer."""
    assert supports_kv_cache(cfg), "kv-cache decode supports the mpt arch"
    cdt = cfg.dtypes.cdt

    def gen(params, vision_x, ids, mask, start_lens):
        dec = params["decoder"]
        media = encode_vision(params, vision_x, None, cfg)
        b, total = ids.shape
        rows = jnp.arange(b)
        n_media = (ids == cfg.media_token_id).sum(-1)  # (B,) media per row

        # ---- prefill: one full forward that also fills the K/V buffers
        media_locations = ids == cfg.media_token_id
        attn_bias = make_attn_bias(mask, cfg.mpt, cdt)
        x = embed_tokens(dec, ids, cdt)
        cks, cvs = [], []
        for i in range(cfg.n_layers):
            xp = dec["xattn"][i]
            if xp is not None:
                x = gated_xattn_forward(
                    xp, x, media, media_locations, heads=cfg.xattn_heads,
                    dim_head=cfg.xattn_dim_head,
                    only_attend_immediate_media=cfg.only_attend_immediate_media)
            x, k, v = _block_prefill(dec["blocks"][i], x, attn_bias, cfg)
            cks.append(k)
            cvs.append(v)
        logits = lm_logits(dec, x, cdt, arch=cfg.mpt.arch)
        first = logits[rows, start_lens - 1].argmax(-1)
        ids = ids.at[rows, start_lens].set(first.astype(ids.dtype))
        mask = mask.at[rows, start_lens].set(1)

        alibi_row = _alibi_key_bias(cfg, total, cdt)
        neg = jnp.asarray(-1e9, cdt)

        def body(carry, j):
            ids, mask, cks, cvs = carry
            pos_c = start_lens + j - 1  # the token generated last step
            tok = ids[rows, pos_c]
            x_t = embed_tokens(dec, tok[:, None], cdt)  # (B, 1, D)
            # attendable = written positions (mask==1 covers prompt + all
            # generated tokens incl. pos_c — causality for free)
            bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)
            if alibi_row is not None:
                bias = bias + alibi_row
            new_cks, new_cvs = [], []
            for i in range(cfg.n_layers):
                xp = dec["xattn"][i]
                if xp is not None:
                    x_t = gated_xattn_forward(
                        xp, x_t, media, None, heads=cfg.xattn_heads,
                        dim_head=cfg.xattn_dim_head,
                        only_attend_immediate_media=
                        cfg.only_attend_immediate_media,
                        text_time=n_media[:, None])
                x_t, ck, cv = _block_decode(dec["blocks"][i], x_t, cks[i],
                                            cvs[i], rows, pos_c, bias, cfg)
                new_cks.append(ck)
                new_cvs.append(cv)
            logits_t = lm_logits(dec, x_t, cdt, arch=cfg.mpt.arch)[:, 0]
            nxt = logits_t.argmax(-1)
            write = start_lens + j
            ids = ids.at[rows, write].set(nxt.astype(ids.dtype))
            mask = mask.at[rows, write].set(1)
            return (ids, mask, new_cks, new_cvs), None

        if n_new > 1:
            (ids, mask, _, _), _ = jax.lax.scan(
                body, (ids, mask, cks, cvs), jnp.arange(1, n_new))
        return ids

    return jax.jit(gen)


def greedy_generate_cached(params: dict, cfg: DeerConfig, vision_x,
                           prompt_ids, prompt_mask,
                           max_new_tokens: int = 10,
                           eos_id=None) -> np.ndarray:
    """Host wrapper with eval/vl_eval.greedy_generate's exact contract
    (buffer padding, per-row decode starts, eos trim) on the cached
    engine."""
    b, s = prompt_ids.shape
    total = s + max_new_tokens
    ids = np.zeros((b, total), np.int32)
    mask = np.zeros((b, total), np.int32)
    ids[:, :s] = np.asarray(prompt_ids)
    mask[:, :s] = np.asarray(prompt_mask)
    start_lens = np.asarray(prompt_mask).sum(1).astype(np.int32)
    gen = make_cached_generate(cfg, max_new_tokens)
    out_ids = np.asarray(gen(params, vision_x, jnp.asarray(ids),
                             jnp.asarray(mask), jnp.asarray(start_lens)))
    out = np.stack([out_ids[r, start_lens[r]:start_lens[r] + max_new_tokens]
                    for r in range(b)])
    if eos_id is not None:
        for r in out:
            stop = np.where(r == eos_id)[0]
            if len(stop):
                r[stop[0]:] = eos_id
    return out
