"""TPU-native BLIP captioner/VQA model — the second pluggable eval-model
family of the upstream VL harness.

Upstream exposes an alternative eval model next to OpenFlamingo
(`open_flamingo/eval/models/blip.py`, a thin shell over HF torch BLIP-2);
here the capability is rebuilt as a from-scratch JAX BLIP: a pre-LN ViT
encoder plus a BERT-style causal text decoder with per-layer cross-attention
over the image tokens (Li et al., BLIP).  The layout and numerics match HF
``BlipForConditionalGeneration`` exactly so published checkpoints convert
straight into the pytree (``convert_hf_blip``; parity proven against a
randomly-initialised HF replica in tests/test_blip.py — same pattern as
tests/test_full_parity_torch.py for the flagship stack).

Design notes (TPU-first):
  - both towers run as stacked-weight ``lax.scan`` layer loops (one fused
    program, no per-layer dispatch);
  - greedy decode is a ``lax.scan`` over a static token buffer with per-row
    prompt cursors, mirroring eval/vl_eval.make_greedy_generate — no
    dynamic shapes, one compile per (buffer, new-token) geometry;
  - softmax/LayerNorm statistics in fp32, weights/activations follow the
    caller's dtype policy (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import (embedding, init_embedding, init_layernorm,
                                     init_linear, layernorm, linear)
from deer_vla_tpu.models.vit import _patchify


@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    eps: float = 1e-5

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524          # bert-base + [DEC]/[ENC] specials
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 512
    eps: float = 1e-12
    bos_token_id: int = 30522        # [DEC] — generation start
    sep_token_id: int = 102          # [SEP] — generation stop
    pad_token_id: int = 0


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    vision: BlipVisionConfig = BlipVisionConfig()
    text: BlipTextConfig = BlipTextConfig()


def blip_base() -> BlipConfig:
    """Salesforce/blip-image-captioning-base geometry."""
    return BlipConfig()


def blip_tiny() -> BlipConfig:
    """Test-scale geometry (same shapes as the HF replica in tests)."""
    return BlipConfig(
        vision=BlipVisionConfig(image_size=24, patch_size=8, width=32,
                                layers=2, heads=4, mlp_dim=64),
        text=BlipTextConfig(vocab_size=100, width=32, layers=2, heads=4,
                            mlp_dim=64, max_positions=40,
                            bos_token_id=97, sep_token_id=98))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_vision_block(key, c: BlipVisionConfig, dtype) -> dict:
    k = jax.random.split(key, 4)
    return {
        "ln1": init_layernorm(c.width, dtype=dtype),
        "ln2": init_layernorm(c.width, dtype=dtype),
        "qkv": init_linear(k[0], c.width, 3 * c.width, dtype=dtype),
        "out": init_linear(k[1], c.width, c.width, dtype=dtype),
        "fc1": init_linear(k[2], c.width, c.mlp_dim, dtype=dtype),
        "fc2": init_linear(k[3], c.mlp_dim, c.width, dtype=dtype),
    }


def _init_attn(key, width: int, kv_width: int, dtype) -> dict:
    """BERT-style attention: separate q/k/v, output dense + LayerNorm."""
    k = jax.random.split(key, 4)
    return {
        "q": init_linear(k[0], width, width, dtype=dtype),
        "k": init_linear(k[1], kv_width, width, dtype=dtype),
        "v": init_linear(k[2], kv_width, width, dtype=dtype),
        "out": init_linear(k[3], width, width, dtype=dtype),
        "ln": init_layernorm(width, dtype=dtype),
    }


def _init_text_layer(key, c: BlipTextConfig, enc_width: int, dtype) -> dict:
    k = jax.random.split(key, 4)
    return {
        "self": _init_attn(k[0], c.width, c.width, dtype),
        "cross": _init_attn(k[1], c.width, enc_width, dtype),
        "inter": init_linear(k[2], c.width, c.mlp_dim, dtype=dtype),
        "output": init_linear(k[3], c.mlp_dim, c.width, dtype=dtype),
        "ln": init_layernorm(c.width, dtype=dtype),
    }


def init_blip(key, cfg: BlipConfig, dtype=jnp.float32) -> dict:
    vc, tc = cfg.vision, cfg.text
    kv, kt, kc, kp, kw, kpos, kh, kd = jax.random.split(key, 8)
    patch_dim = 3 * vc.patch_size * vc.patch_size
    vision = {
        "class_embedding": 0.02 * jax.random.normal(kc, (vc.width,), dtype),
        "position_embedding": 0.02 * jax.random.normal(
            kpos, (vc.seq_len, vc.width), dtype),
        "patch_embed": init_linear(kp, patch_dim, vc.width, dtype=dtype),
        "blocks": [_init_vision_block(k, vc, dtype)
                   for k in jax.random.split(kv, vc.layers)],
        "ln_post": init_layernorm(vc.width, dtype=dtype),
    }
    text = {
        "wte": init_embedding(kw, tc.vocab_size, tc.width, dtype=dtype),
        "wpe": init_embedding(kh, tc.max_positions, tc.width, dtype=dtype),
        "ln_emb": init_layernorm(tc.width, dtype=dtype),
        "layers": [_init_text_layer(k, tc, vc.width, dtype)
                   for k in jax.random.split(kt, tc.layers)],
        "head_transform": init_linear(kd, tc.width, tc.width, dtype=dtype),
        "head_ln": init_layernorm(tc.width, dtype=dtype),
        "head": init_linear(jax.random.split(kd)[0], tc.width, tc.vocab_size,
                            dtype=dtype),
    }
    return {"vision": vision, "text": text}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def vision_forward(params: dict, pixel_values: jnp.ndarray,
                   cfg: BlipVisionConfig) -> jnp.ndarray:
    """pixel_values: (B, 3, H, W) -> (B, 1+P, D) image tokens (incl. CLS),
    after the final post-LayerNorm — what the text decoder cross-attends to
    (HF BlipVisionModel semantics)."""
    p = params["vision"]
    b = pixel_values.shape[0]
    h = linear(p["patch_embed"], _patchify(pixel_values, cfg.patch_size))
    cls = jnp.broadcast_to(p["class_embedding"].astype(h.dtype),
                           (b, 1, cfg.width))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + p["position_embedding"].astype(h.dtype)

    def body(h, blk):
        a = layernorm(blk["ln1"], h, cfg.eps)
        qkv = linear(blk["qkv"], a)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = dot_attention(split_heads(q, cfg.heads), split_heads(k, cfg.heads),
                          split_heads(v, cfg.heads))
        h = h + linear(blk["out"], merge_heads(a))
        m = layernorm(blk["ln2"], h, cfg.eps)
        h = h + linear(blk["fc2"], jax.nn.gelu(linear(blk["fc1"], m),
                                               approximate=False))
        return h, None

    from deer_vla_tpu.ops.layers import stack_layer_tree
    h, _ = jax.lax.scan(body, h, stack_layer_tree(p["blocks"]))
    return layernorm(p["ln_post"], h, cfg.eps)


def _bert_attn(p: dict, x: jnp.ndarray, kv: jnp.ndarray, heads: int,
               bias: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    """Post-LN BERT attention block: LN(dense(attn(x, kv)) + x)."""
    q = split_heads(linear(p["q"], x), heads)
    k = split_heads(linear(p["k"], kv), heads)
    v = split_heads(linear(p["v"], kv), heads)
    a = merge_heads(dot_attention(q, k, v, bias=bias))
    return layernorm(p["ln"], linear(p["out"], a) + x, eps)


def text_decoder_forward(params: dict, input_ids: jnp.ndarray,
                         attention_mask: jnp.ndarray,
                         encoder_states: jnp.ndarray,
                         cfg: BlipTextConfig) -> jnp.ndarray:
    """Causal BERT decoder with cross-attention -> (B, S, vocab) logits.

    input_ids/attention_mask: (B, S); encoder_states: (B, Sv, Dv).  The
    self-attention mask is causal ∧ key-padding (HF
    get_extended_attention_mask for is_decoder); cross-attention sees every
    image token."""
    p = params["text"]
    b, s = input_ids.shape
    h = embedding(p["wte"], input_ids)
    h = h + p["wpe"]["w"][:s].astype(h.dtype)
    h = layernorm(p["ln_emb"], h, cfg.eps)

    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    keep = causal[None, None] & (attention_mask[:, None, None, :] > 0)
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    def body(h, lp):
        h = _bert_attn(lp["self"], h, h, cfg.heads, bias, cfg.eps)
        h = _bert_attn(lp["cross"], h, encoder_states, cfg.heads, None,
                       cfg.eps)
        m = jax.nn.gelu(linear(lp["inter"], h), approximate=False)
        h = layernorm(lp["ln"], linear(lp["output"], m) + h, cfg.eps)
        return h, None

    from deer_vla_tpu.ops.layers import stack_layer_tree
    h, _ = jax.lax.scan(body, h, stack_layer_tree(p["layers"]))

    t = jax.nn.gelu(linear(p["head_transform"], h), approximate=False)
    t = layernorm(p["head_ln"], t, cfg.eps)
    return linear(p["head"], t).astype(jnp.float32)


def blip_forward(params: dict, pixel_values: jnp.ndarray,
                 input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 cfg: BlipConfig) -> jnp.ndarray:
    """Full captioner forward -> (B, S, vocab) logits (HF
    BlipForConditionalGeneration.forward equivalent)."""
    enc = vision_forward(params, pixel_values, cfg.vision)
    return text_decoder_forward(params, input_ids, attention_mask, enc,
                                cfg.text)


# ---------------------------------------------------------------------------
# greedy generation (static-buffer lax.scan, per-row prompt cursors)
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.lru_cache(maxsize=8)
def make_blip_generate(cfg: BlipConfig, n_new: int):
    """Cached jitted generate(params, pixel_values, ids, mask, start_lens)
    — same buffer protocol as eval/vl_eval.make_greedy_generate: ids is a
    (B, total) right-padded prompt buffer, each row decodes from its own
    prompt length."""

    def gen(params, pixel_values, ids, mask, start_lens):
        enc = vision_forward(params, pixel_values, cfg.vision)
        rows = jnp.arange(ids.shape[0])

        def body(carry, i):
            ids, mask = carry
            logits = text_decoder_forward(params, ids, mask, enc, cfg.text)
            pos = start_lens + i - 1
            nxt = logits[rows, pos].argmax(-1)
            write = start_lens + i
            ids = ids.at[rows, write].set(nxt.astype(ids.dtype))
            mask = mask.at[rows, write].set(1)
            return (ids, mask), nxt

        (ids, mask), _ = jax.lax.scan(body, (ids, mask), jnp.arange(n_new))
        return ids

    return jax.jit(gen)


def blip_generate(params: dict, cfg: BlipConfig, pixel_values,
                  prompt_ids, prompt_mask,
                  max_new_tokens: int = 10) -> np.ndarray:
    """Greedy caption continuation.  prompt_ids rows must start with the
    decoder-start token ([DEC], text.bos_token_id) — the HF generate
    contract (modeling_blip.py forces input_ids[:, 0] = bos).  Returns the
    (B, max_new) generated ids, tail-padded with [SEP] after stop."""
    b, s = prompt_ids.shape
    if s + max_new_tokens > cfg.text.max_positions:
        raise ValueError(
            f"BLIP decode buffer {s + max_new_tokens} (prompt {s} + "
            f"{max_new_tokens} new) exceeds text.max_positions="
            f"{cfg.text.max_positions}; shorten the prompt (fewer "
            f"--shots / shorter demos) or use a larger-context config")
    ids = np.zeros((b, s + max_new_tokens), np.int32)
    mask = np.zeros((b, s + max_new_tokens), np.int32)
    ids[:, :s] = np.asarray(prompt_ids)
    mask[:, :s] = np.asarray(prompt_mask)
    start_lens = np.asarray(prompt_mask).sum(1).astype(np.int32)
    gen = make_blip_generate(cfg, max_new_tokens)
    out = np.asarray(gen(params, pixel_values, jnp.asarray(ids),
                         jnp.asarray(mask), jnp.asarray(start_lens)))
    rows = np.stack([out[r, start_lens[r]:start_lens[r] + max_new_tokens]
                     for r in range(b)])
    for r in rows:
        stop = np.where(r == cfg.text.sep_token_id)[0]
        if len(stop):
            r[stop[0]:] = cfg.text.sep_token_id
    return rows


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def _t(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w).T)


def _a(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w))


def convert_hf_blip(state_dict, cfg: BlipConfig) -> dict:
    """HF BlipForConditionalGeneration state_dict -> init_blip pytree.

    Consumes EVERY key (asserts nothing is left over — the same
    name-coverage discipline as utils/convert.py for the flagship stack).
    Accepts torch tensors or numpy arrays."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v))
          for k, v in state_dict.items()}
    used = set()

    def take(name):
        used.add(name)
        return sd[name]

    def lin(prefix):
        p = {"w": _t(take(prefix + ".weight"))}
        if prefix + ".bias" in sd:
            p["b"] = _a(take(prefix + ".bias"))
        return p

    def ln(prefix):
        return {"scale": _a(take(prefix + ".weight")),
                "bias": _a(take(prefix + ".bias"))}

    vc, tc = cfg.vision, cfg.text
    v = "vision_model."
    conv_w = take(v + "embeddings.patch_embedding.weight")
    vision = {
        "class_embedding": _a(take(v + "embeddings.class_embedding")).reshape(
            vc.width),
        "position_embedding": _a(take(v + "embeddings.position_embedding")
                                 ).reshape(vc.seq_len, vc.width),
        # conv (D, 3, p, p) -> matmul (3*p*p, D); _patchify flattens (c,ph,pw)
        "patch_embed": {"w": _a(conv_w.reshape(vc.width, -1).T),
                        "b": _a(take(v + "embeddings.patch_embedding.bias"))},
        "ln_post": ln(v + "post_layernorm"),
        "blocks": [],
    }
    for i in range(vc.layers):
        b = f"{v}encoder.layers.{i}."
        vision["blocks"].append({
            "ln1": ln(b + "layer_norm1"),
            "ln2": ln(b + "layer_norm2"),
            "qkv": lin(b + "self_attn.qkv"),
            "out": lin(b + "self_attn.projection"),
            "fc1": lin(b + "mlp.fc1"),
            "fc2": lin(b + "mlp.fc2"),
        })

    t = "text_decoder.bert."
    text = {
        "wte": {"w": _a(take(t + "embeddings.word_embeddings.weight"))},
        "wpe": {"w": _a(take(t + "embeddings.position_embeddings.weight"))},
        "ln_emb": ln(t + "embeddings.LayerNorm"),
        "layers": [],
        "head_transform": lin("text_decoder.cls.predictions.transform.dense"),
        "head_ln": ln("text_decoder.cls.predictions.transform.LayerNorm"),
        "head": {"w": _t(take("text_decoder.cls.predictions.decoder.weight")),
                 "b": _a(take("text_decoder.cls.predictions.decoder.bias"))},
    }
    # decoder bias is tied to cls.predictions.bias in HF; consume the alias
    if "text_decoder.cls.predictions.bias" in sd:
        text["head"]["b"] = _a(take("text_decoder.cls.predictions.bias"))

    def bert_attn(prefix):
        return {"q": lin(prefix + ".self.query"),
                "k": lin(prefix + ".self.key"),
                "v": lin(prefix + ".self.value"),
                "out": lin(prefix + ".output.dense"),
                "ln": ln(prefix + ".output.LayerNorm")}

    for i in range(tc.layers):
        b = f"{t}encoder.layer.{i}."
        text["layers"].append({
            "self": bert_attn(b + "attention"),
            "cross": bert_attn(b + "crossattention"),
            "inter": lin(b + "intermediate.dense"),
            "output": lin(b + "output.dense"),
            "ln": ln(b + "output.LayerNorm"),
        })

    leftover = set(sd) - used
    # HF registers non-parameter buffers (position_ids) in some versions
    leftover = {k for k in leftover if not k.endswith("position_ids")}
    assert not leftover, f"unconsumed HF BLIP keys: {sorted(leftover)[:8]}"
    return {"vision": vision, "text": text}


BLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
BLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def blip_preprocess(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float -> (B, 3, size, size) normalized, matching
    BlipImageProcessor (bicubic resize + OPENAI_CLIP mean/std)."""
    x = images.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], size, size, 3), "bicubic")
    mean = jnp.asarray(BLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(BLIP_IMAGE_STD, jnp.float32)
    return ((x - mean) / std).transpose(0, 3, 1, 2)
