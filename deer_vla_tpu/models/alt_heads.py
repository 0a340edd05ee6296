"""Alternative action decoders: FCDecoder and GPTDecoder.

Ports of action_head.py:317-405 (FCDecoder) and :624-728 (GPTDecoder, with
its trajectory_gpt2.py GPT-2 temporal backbone: 8 layers, 8 heads, learned
position embeddings, causal).  The GPT decoder's streaming mode keeps a
functional history buffer (features of the last ``history_len`` frames)
instead of the reference's mutable ``history_memory`` list
(action_head.py:702-719).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import HeadConfig
from deer_vla_tpu.models.action_head import HeadOutput, _mlp_head_forward, \
    _init_mlp_head, pool_tokens
from deer_vla_tpu.ops.attention import dot_attention, merge_heads, split_heads
from deer_vla_tpu.ops.layers import (init_layernorm, init_linear, layernorm,
                                     linear, trunc_normal)


# ---------------------------------------------------------------------------
# FCDecoder (action_head.py:317-405)
# ---------------------------------------------------------------------------


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0), rng


def init_fc_decoder(key, cfg: HeadConfig, dtype=jnp.float32) -> dict:
    """FCDecoder params (action_head.py:317-371).

    use_state: the reference declares fc_state = MLPNohHead(7, 128) and
    bumps in_features by 128 at init (:338-341) but its forward concatenates
    the state embedding only AFTER the mlp+pool (:393-397) — the two are
    inconsistent and the construction itself TypeErrors on MLPTanhHead's
    missing dropout arg, i.e. the reference's fc+state path is dead code.
    Here the WORKING semantics: fc_state(7 -> 1024 -> 512 -> 128) on the
    proprio rows, concatenated to the pooled features, with the action /
    gripper MLPs sized hidden+128."""
    k = jax.random.split(key, 7)
    import dataclasses
    mcfg = (dataclasses.replace(cfg, hidden_size=cfg.hidden_size + 128)
            if cfg.use_state else cfg)
    p = {
        "fc1": init_linear(k[0], cfg.in_features, cfg.in_features // 2, dtype=dtype),
        "fc2": init_linear(k[1], cfg.in_features // 2, cfg.hidden_size, dtype=dtype),
        "actions": _init_mlp_head(k[2], mcfg, cfg.out_features * cfg.multi_step_action, dtype),
        "gripper": _init_mlp_head(k[3], mcfg, cfg.multi_step_action, dtype),
    }
    if cfg.use_state:
        p["fc_state"] = {
            "l1": init_linear(k[4], 7, 1024, dtype=dtype),
            "l2": init_linear(k[5], 1024, 512, dtype=dtype),
            "l3": init_linear(k[6], 512, 128, dtype=dtype),
        }
    return p


def fc_decoder_forward(p: dict, feat: jnp.ndarray, cfg: HeadConfig,
                       window: Optional[int] = None,
                       state: Optional[jnp.ndarray] = None,
                       dropout_rng=None, train: bool = False) -> HeadOutput:
    """feat: (B*W, lang_len, d).  MLP -> max-pool over tokens -> heads
    (reference pools AFTER the mlp, action_head.py:387-388).  Dropout
    placement mirrors the reference mlp Sequential (:357-363: before fc1
    and before fc2)."""
    w = window or cfg.window_size
    h, dropout_rng = _dropout(feat, cfg.dropout, dropout_rng, train)
    h = jax.nn.relu(linear(p["fc1"], h))
    h, dropout_rng = _dropout(h, cfg.dropout, dropout_rng, train)
    h = linear(p["fc2"], h)
    h = pool_tokens(h, "max")
    h = h.reshape(-1, w, h.shape[-1])
    if cfg.use_state and state is not None and "fc_state" in p:
        s = state.reshape(-1, state.shape[-1])
        s7 = jnp.concatenate([s[:, :6], s[:, -1:]], -1).astype(h.dtype)
        fs = p["fc_state"]
        se = jax.nn.relu(linear(fs["l1"], s7))
        se = jax.nn.relu(linear(fs["l2"], se))
        se = linear(fs["l3"], se)
        h = jnp.concatenate([h, se.reshape(-1, w, se.shape[-1])], -1)
    rngs = (jax.random.split(dropout_rng, 2)
            if dropout_rng is not None else (None, None))
    act = jnp.tanh(_mlp_head_forward(p["actions"], h, cfg,
                                     dropout_rng=rngs[0], train=train))
    glog = _mlp_head_forward(p["gripper"], h, cfg, dropout_rng=rngs[1],
                             train=train)
    return HeadOutput(act, jax.nn.sigmoid(glog), glog)


# ---------------------------------------------------------------------------
# GPTDecoder (action_head.py:624-728 + trajectory_gpt2.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GPTDecoderConfig:
    head: HeadConfig = HeadConfig()
    hidden_size: Optional[int] = None
    n_layer: int = 8
    n_head: int = 8
    history_len: Optional[int] = None
    use_pe: bool = True
    # GPT2Config defaults embd/attn/resid_pdrop = 0.1 (get_gpt_model builds
    # the backbone with defaults, trajectory_gpt2.py:730-744)
    dropout: float = 0.1

    @property
    def dim(self) -> int:
        return self.hidden_size or self.head.in_features

    @property
    def hist(self) -> int:
        return self.history_len or self.head.window_size


def init_gpt_decoder(key, cfg: GPTDecoderConfig, dtype=jnp.float32) -> dict:
    d = cfg.dim
    keys = jax.random.split(key, 6 + cfg.n_layer)
    p = {
        "wpe": trunc_normal(keys[0], (cfg.hist, d), 0.02, dtype) if cfg.use_pe else None,
        "ln_f": init_layernorm(d, dtype=dtype),
        "blocks": [],
        "actions": _init_mlp_head(keys[1], _head_cfg_with_hidden(cfg),
                                  cfg.head.out_features * cfg.head.multi_step_action, dtype),
        "gripper": _init_mlp_head(keys[2], _head_cfg_with_hidden(cfg),
                                  cfg.head.multi_step_action, dtype),
    }
    if cfg.dim != cfg.head.in_features:
        p["fc"] = init_linear(keys[3], cfg.head.in_features, d, dtype=dtype)
    for i in range(cfg.n_layer):
        k = jax.random.split(keys[6 + i], 4)
        p["blocks"].append({
            "ln_1": init_layernorm(d, dtype=dtype),
            "qkv": init_linear(k[0], d, 3 * d, dtype=dtype),
            "out": init_linear(k[1], d, d, dtype=dtype),
            "ln_2": init_layernorm(d, dtype=dtype),
            "mlp_fc": init_linear(k[2], d, 4 * d, dtype=dtype),
            "mlp_proj": init_linear(k[3], 4 * d, d, dtype=dtype),
        })
    return p


def _head_cfg_with_hidden(cfg: GPTDecoderConfig) -> HeadConfig:
    import dataclasses
    return dataclasses.replace(cfg.head, hidden_size=cfg.dim)


def _gpt_backbone(p: dict, x: jnp.ndarray, cfg: GPTDecoderConfig,
                  valid: Optional[jnp.ndarray] = None,
                  dropout_rng=None, train: bool = False) -> jnp.ndarray:
    """x: (B, T, d) features; causal GPT-2 stack.

    Dropout mirrors GPT-2 (trajectory_gpt2.py:142-143,255-270,521): embd
    after the position add, resid after each projection.  attn_pdrop (on
    the softmax probabilities) is folded into a dropout on the attention
    OUTPUT instead — the fused attention kernel doesn't expose probs; same
    rate, TPU-native placement."""
    b, t, d = x.shape
    if p.get("wpe") is not None:
        x = x + p["wpe"][:t].astype(x.dtype)
    x, dropout_rng = _dropout(x, cfg.dropout, dropout_rng, train)
    causal = jnp.tril(jnp.ones((t, t), bool))
    if valid is not None:  # mask invalid (not-yet-filled) history slots
        causal = causal & valid[:, None, :]
        bias = jnp.where(causal[:, None], 0.0, -1e9).astype(jnp.float32)
    else:
        bias = jnp.where(causal, 0.0, -1e9)[None, None].astype(jnp.float32)
    for blk in p["blocks"]:
        h = layernorm(blk["ln_1"], x)
        q, k, v = jnp.split(linear(blk["qkv"], h), 3, axis=-1)
        q, k, v = (split_heads(z, cfg.n_head) for z in (q, k, v))
        a = merge_heads(dot_attention(q, k, v, bias=bias))
        a, dropout_rng = _dropout(a, cfg.dropout, dropout_rng, train)
        o = linear(blk["out"], a)
        o, dropout_rng = _dropout(o, cfg.dropout, dropout_rng, train)
        x = x + o
        h = layernorm(blk["ln_2"], x)
        m = linear(blk["mlp_proj"],
                   jax.nn.gelu(linear(blk["mlp_fc"], h), approximate=True))
        m, dropout_rng = _dropout(m, cfg.dropout, dropout_rng, train)
        x = x + m
    return layernorm(p["ln_f"], x)


def gpt_decoder_forward(p: dict, feat: jnp.ndarray, cfg: GPTDecoderConfig,
                        window: Optional[int] = None,
                        last_action: bool = False,
                        dropout_rng=None, train: bool = False) -> HeadOutput:
    """Window mode. feat: (B*W, lang_len, d)."""
    w = window or cfg.head.window_size
    x = pool_tokens(feat, cfg.head.pooling) if feat.ndim == 3 else feat
    x = x.reshape(-1, w, x.shape[-1])
    if "fc" in p:
        x = linear(p["fc"], x)
    rngs = (jax.random.split(dropout_rng, 3)
            if dropout_rng is not None else (None,) * 3)
    y = _gpt_backbone(p, x, cfg, dropout_rng=rngs[0], train=train)
    if last_action:
        y = y[:, -1:, :]
    hcfg = _head_cfg_with_hidden(cfg)
    act = jnp.tanh(_mlp_head_forward(p["actions"], y, hcfg,
                                     dropout_rng=rngs[1], train=train))
    glog = _mlp_head_forward(p["gripper"], y, hcfg, dropout_rng=rngs[2],
                             train=train)
    return HeadOutput(act, jax.nn.sigmoid(glog), glog)


class GPTCarry(NamedTuple):
    history: jnp.ndarray  # (B, hist_len, d)
    count: jnp.ndarray    # (B,) int32 — PER-STREAM frame counts so batched
    #                       serving can reset one lane without touching the
    #                       others (scan_policy.reset_streams)


def gpt_zero_carry(cfg: GPTDecoderConfig, batch: int, dtype=jnp.float32) -> GPTCarry:
    return GPTCarry(jnp.zeros((batch, cfg.hist, cfg.dim), dtype),
                    jnp.zeros((batch,), jnp.int32))


def gpt_decoder_step(p: dict, feat: jnp.ndarray, carry: GPTCarry,
                     cfg: GPTDecoderConfig) -> Tuple[HeadOutput, GPTCarry]:
    """Streaming: push the new frame into the rolling history buffer and
    attend over the valid slots (action_head.py:702-719 semantics —
    recompute over the window each step, oldest frame dropped).  All
    buffer updates are vectorized over per-stream counts."""
    x = pool_tokens(feat, cfg.head.pooling) if feat.ndim == 3 else feat
    if "fc" in p:
        x = linear(p["fc"], x)
    hist, count = carry
    full = count >= cfg.hist                            # (B,)
    shifted = jnp.concatenate([hist[:, 1:], x[:, None]], 1)
    pos = jnp.minimum(count, cfg.hist - 1)              # (B,) insert slot
    onehot = jnp.arange(cfg.hist)[None, :] == pos[:, None]
    inserted = jnp.where(onehot[:, :, None], x[:, None], hist)
    hist = jnp.where(full[:, None, None], shifted, inserted)
    count = jnp.minimum(count + 1, jnp.int32(cfg.hist))
    valid = jnp.arange(cfg.hist)[None, :] < count[:, None]  # (B, hist)
    y = _gpt_backbone(p, hist, cfg, valid)
    # last valid position, per stream
    idx = jnp.clip(count - 1, 0, cfg.hist - 1)          # (B,)
    y_last = jnp.take_along_axis(
        y, jnp.broadcast_to(idx[:, None, None],
                            (y.shape[0], 1, y.shape[2])), axis=1)
    hcfg = _head_cfg_with_hidden(cfg)
    act = jnp.tanh(_mlp_head_forward(p["actions"], y_last, hcfg))
    glog = _mlp_head_forward(p["gripper"], y_last, hcfg)
    return HeadOutput(act, jax.nn.sigmoid(glog), glog), GPTCarry(hist, count)
