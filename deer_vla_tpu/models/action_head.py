r"""Deterministic LSTM action head — port of
robot_flamingo/models/action_head.py:408-611 (DeterministicDecoder) plus the
MLPTanhHead / MLPSigmoidHead stacks (:82-269).

Pipeline per head (action_head.py:519-605):
  (B*W, lang_len, d) --max-pool over lang tokens--> (B*W, d)
  --reshape--> (B, W, d) --[+ proprio state embedding]-->
  --LSTM over W--> (B, W, H) --> MLPTanh -> arm (B, W, 6*k)
                             \-> MLPSigmoid -> gripper probs+logits (B, W, k)

Two entry points over shared params (replacing the reference's stateful
``window_size`` toggling, flamingo_mpt.py:275-290 / eval_utils.py:300-311):
  * ``head_forward``  — full-window training mode (carry starts at zeros)
  * ``head_step``     — streaming single-frame inference with an explicit
    carry; the caller decides whether to commit the returned carry, which
    subsumes the reference's update_hidden_state=False / tmp_hidden_state
    speculative protocol (action_head.py:554-558, value_net.py:88-91).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import HeadConfig
from deer_vla_tpu.ops.layers import (init_embedding, init_layernorm,
                                     init_linear, layernorm, linear)
from deer_vla_tpu.ops.lstm import (Carry, init_lstm, lstm_forward, lstm_step,
                                   zero_carry)


class HeadOutput(NamedTuple):
    actions: jnp.ndarray        # (B, W, 6*multi_step) tanh arm action
    gripper_probs: jnp.ndarray  # (B, W, multi_step) sigmoid
    gripper_logits: jnp.ndarray  # pre-sigmoid logits (for BCE-with-logits)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_mlp_head(key, cfg: HeadConfig, out_dim: int, dtype) -> dict:
    dims = (cfg.hidden_size,) + tuple(cfg.mlp_hidden_dims[:cfg.mlp_num_hidden_layers]) + (out_dim,)
    keys = jax.random.split(key, len(dims) - 1)
    layers = [init_linear(k, dims[i], dims[i + 1], bias=True, dtype=dtype)
              for i, k in enumerate(keys)]
    lns = [init_layernorm(dims[i + 1], dtype=dtype) if cfg.mlp_layernorm else None
           for i in range(len(dims) - 2)]
    return {"layers": layers, "lns": lns}


def init_head(key, cfg: HeadConfig, dtype=jnp.float32,
              features_only: bool = False) -> dict:
    """features_only: the diffusion variant — the LSTM is a feature
    extractor and the action/gripper MLPs are never built (use_diff skips
    them, action_head.py:364-371)."""
    k = jax.random.split(key, 6)
    p = {
        "rnn": init_lstm(k[0], cfg.in_features, cfg.hidden_size,
                         cfg.lstm_num_layers, cfg.lstm_layernorm, dtype),
    }
    if not features_only:
        p["actions"] = _init_mlp_head(
            k[1], cfg, cfg.out_features * cfg.multi_step_action, dtype)
        p["gripper"] = _init_mlp_head(k[2], cfg, 1 * cfg.multi_step_action,
                                      dtype)
    if cfg.use_state:
        # action_head.py:447-449: arm state (6,) -> Linear+ReLU to in_features;
        # gripper state {0,1} -> Embedding+ReLU; concat -> Linear to in_features.
        p["embed_arm_state"] = init_linear(k[3], 6, cfg.in_features, bias=True, dtype=dtype)
        p["embed_gripper_state"] = init_embedding(k[4], 2, cfg.in_features, dtype=dtype)
        p["embed_state"] = init_linear(k[5], 2 * cfg.in_features, cfg.in_features,
                                       bias=True, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def _mlp_head_forward(p: dict, x: jnp.ndarray, cfg: HeadConfig, *,
                      dropout_rng=None, train: bool = False) -> jnp.ndarray:
    """Returns pre-activation output of the final linear (caller applies
    tanh / sigmoid; BCE uses the raw logits)."""
    n = len(p["layers"])

    def maybe_dropout(x, rng_idx):
        nonlocal dropout_rng
        if train and cfg.dropout > 0.0 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - cfg.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
        return x

    # dropout_mode (action_head.py:84-133): 'layerwise' = dropout before
    # every hidden linear AND after the last hidden ReLU; 'last' = only after
    # the final hidden ReLU; 'wo_last' = before every hidden linear but NOT
    # after the last ReLU (the reference's elif-chain fallback layout).
    if cfg.dropout_mode in ("layerwise", "wo_last"):
        x = maybe_dropout(x, 0)
    for i in range(n - 1):
        x = linear(p["layers"][i], x)
        if p["lns"][i] is not None:
            x = layernorm(p["lns"][i], x)
        x = jax.nn.relu(x)
        if (cfg.dropout_mode == "layerwise"
                or (cfg.dropout_mode == "wo_last" and i < n - 2)
                or (cfg.dropout_mode == "last" and i == n - 2)):
            x = maybe_dropout(x, i + 1)
    return linear(p["layers"][-1], x)


def pool_tokens(feat: jnp.ndarray, pooling: str = "max") -> jnp.ndarray:
    """(..., lang_len, d) -> (..., d).  AdaptiveMaxPool1d(1) over the token
    dim (action_head.py:520) — padding positions included, faithful."""
    if pooling == "max":
        return feat.max(axis=-2)
    return feat.mean(axis=-2)


def embed_state(p: dict, state: jnp.ndarray, cfg: HeadConfig) -> jnp.ndarray:
    """state: (..., 7) -> (..., in_features). action_head.py:524-536."""
    arm = jax.nn.relu(linear(p["embed_arm_state"], state[..., :6]))
    grip_idx = ((state[..., -1] + 1.0) / 2).astype(jnp.int32)
    grip = jax.nn.relu(jnp.take(p["embed_gripper_state"]["w"].astype(state.dtype),
                                grip_idx, axis=0))
    return linear(p["embed_state"], jnp.concatenate([arm, grip], axis=-1))


def _prepare_input(p, feat, state, cfg: HeadConfig, window: int):
    """feat: (B*W, lang_len, d) or (B*W, d) -> (B, W, d) with optional state add."""
    if feat.ndim == 3:
        feat = pool_tokens(feat, cfg.pooling)
    d = feat.shape[-1]
    feat = feat.reshape(-1, window, d)
    if cfg.use_state and state is not None:
        se = embed_state(p, state, cfg)
        feat = feat + se.reshape(-1, window, se.shape[-1])
    return feat


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def head_forward(p: dict, feat: jnp.ndarray, cfg: HeadConfig,
                 state: Optional[jnp.ndarray] = None,
                 *, window: Optional[int] = None, last_action: bool = False,
                 dropout_rng=None, train: bool = False) -> HeadOutput:
    """Full-window mode. feat: (B*W, lang_len, d); returns per-step actions
    (or last step only if ``last_action``, action_head.py:593-594)."""
    w = window if window is not None else cfg.window_size
    x = _prepare_input(p, feat, state, cfg, w)
    rngs = jax.random.split(dropout_rng, 3) if dropout_rng is not None else (None,) * 3
    y, _ = lstm_forward(p["rnn"], x, None, dropout_rate=cfg.lstm_dropout,
                        dropout_rng=rngs[0], train=train)
    if last_action:
        y = y[:, -1:, :]
    act = jnp.tanh(_mlp_head_forward(p["actions"], y, cfg, dropout_rng=rngs[1], train=train))
    glog = _mlp_head_forward(p["gripper"], y, cfg, dropout_rng=rngs[2], train=train)
    return HeadOutput(act, jax.nn.sigmoid(glog), glog)


def head_features(p: dict, feat: jnp.ndarray, cfg: HeadConfig,
                  state: Optional[jnp.ndarray] = None,
                  *, window: Optional[int] = None) -> jnp.ndarray:
    """Full-window LSTM features (B, W, hidden) — the use_diff return path
    (action_head.py:602-603: with use_diff the decoder returns rnn_out as
    the diffusion model's global conditioning instead of actions)."""
    w = window if window is not None else cfg.window_size
    x = _prepare_input(p, feat, state, cfg, w)
    y, _ = lstm_forward(p["rnn"], x, None)
    return y


def head_feature_step(p: dict, feat: jnp.ndarray, carry: Optional[Carry],
                      cfg: HeadConfig, state: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, Carry]:
    """Streaming LSTM features: one frame -> ((B, hidden), new_carry).
    Same speculative-carry contract as head_step."""
    if feat.ndim == 3:
        feat = pool_tokens(feat, cfg.pooling)
    if cfg.use_state and state is not None:
        feat = feat + embed_state(p, state.reshape(feat.shape[0], -1), cfg)
    if carry is None:
        carry = zero_carry(cfg.lstm_num_layers, feat.shape[0], cfg.hidden_size,
                           feat.dtype)
    y, new_carry = lstm_step(p["rnn"], feat, carry)
    return y, new_carry


def head_step(p: dict, feat: jnp.ndarray, carry: Optional[Carry],
              cfg: HeadConfig, state: Optional[jnp.ndarray] = None
              ) -> Tuple[HeadOutput, Carry]:
    """Streaming mode: one frame. feat: (B, lang_len, d) or (B, d).

    Returns (output with W==1, new_carry).  The caller commits the carry only
    for the exit that actually fires — functional equivalent of
    tmp_hidden_state/update_hidden_state (action_head.py:494-497,554-558).
    """
    if feat.ndim == 3:
        feat = pool_tokens(feat, cfg.pooling)
    if cfg.use_state and state is not None:
        feat = feat + embed_state(p, state.reshape(feat.shape[0], -1), cfg)
    if carry is None:
        carry = zero_carry(cfg.lstm_num_layers, feat.shape[0], cfg.hidden_size,
                           feat.dtype)
    y, new_carry = lstm_step(p["rnn"], feat, carry)
    y = y[:, None, :]  # (B, 1, H)
    act = jnp.tanh(_mlp_head_forward(p["actions"], y, cfg))
    glog = _mlp_head_forward(p["gripper"], y, cfg)
    return HeadOutput(act, jax.nn.sigmoid(glog), glog), new_carry
