"""Unified action-head routing over the four head families.

The reference selects heads via decoder_type/head_type at module-construction
time (flamingo_mpt.py:149-182: 'lstm'+'deterministic' -> DeterministicDecoder,
'fc' -> FCDecoder, 'gpt' -> GPTDecoder, 'diffusion' -> DiffusionDecoder;
factory flags factory.py:89,193; CLI flags train_calvin_post_strategy.py:308,
317).  Here routing is a pure function of ``cfg.head_type`` so every caller
(training forward, calibration, serving engines) goes through one seam.

Head families and their streaming carries:
  deterministic — LSTM head (action_head.py), carry = LSTM Carry
  fc            — FCDecoder (alt_heads.py), no temporal state, carry = ()
  gpt           — GPTDecoder (alt_heads.py), carry = GPTCarry history buffer
  diffusion     — the LSTM runs as a FEATURE extractor (use_diff protocol,
                  action_head.py:602-603); HeadOutput.actions then carries
                  the (hidden,) conditioning feature and the DDPM sampler
                  (eval/diffusion_policy.py) turns it into an action plan.
                  The exit-delta criterion therefore compares features, which
                  matches the reference: with use_diff the value net's head
                  forward returns features too (value_net.py:125-131 calls
                  the extra exit whose use_diff forward returns rnn_out).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.action_head import (HeadOutput, head_feature_step,
                                             head_features, head_forward,
                                             head_step, init_head)
from deer_vla_tpu.models.alt_heads import (GPTDecoderConfig, fc_decoder_forward,
                                           gpt_decoder_forward,
                                           gpt_decoder_step, gpt_zero_carry,
                                           init_fc_decoder, init_gpt_decoder)
from deer_vla_tpu.models.diffusion import DiffusionConfig
from deer_vla_tpu.ops.lstm import zero_carry

HEAD_TYPES = ("deterministic", "fc", "gpt", "diffusion")


def check_head_type(cfg: DeerConfig) -> None:
    """Mirror the reference's construction-time restrictions
    (flamingo_mpt.py:157-165: FCDecoder only under use_hist/vit_concat)."""
    if cfg.head_type not in HEAD_TYPES:
        raise ValueError(f"unknown head_type {cfg.head_type!r}; "
                         f"one of {HEAD_TYPES}")
    if cfg.head_type == "fc" and not (cfg.use_hist
                                      or cfg.fusion_mode == "vit_concat"):
        raise NotImplementedError(
            "head_type 'fc' requires --use_hist or --fusion_mode vit_concat "
            "(the FCDecoder has no temporal state; the window must already "
            "be folded into the features, flamingo_mpt.py:157-165)")
    if cfg.head_type == "gpt" and (cfg.use_state or cfg.head.use_state):
        raise NotImplementedError(
            "head_type 'gpt' does not consume proprio state (the reference "
            "GPTDecoder.forward takes no state argument and its use_state "
            "init path is dead code); drop --use_state or pick another head")
    if cfg.head_type == "diffusion":
        hist = cfg.n_obs_steps - 1
        if not (0 <= hist < cfg.window_size):
            raise ValueError(
                f"diffusion head needs 1 <= n_obs_steps <= window_size "
                f"(got n_obs_steps={cfg.n_obs_steps}, "
                f"window_size={cfg.window_size})")
        if cfg.diff_horizon < cfg.window_size:
            raise ValueError(
                f"diff_horizon ({cfg.diff_horizon}) must cover the training "
                f"window ({cfg.window_size})")
        if cfg.head.multi_step_action != 1:
            raise NotImplementedError(
                "diffusion head emits its own action plan; "
                "multi_step_action must be 1")
        if cfg.use_hist or cfg.fusion_mode == "vit_concat":
            raise NotImplementedError(
                "diffusion head needs the per-frame window (its loss and "
                "sampler condition on an in-window action history); "
                "use_hist / vit_concat fold the window away")


def gpt_head_config(cfg: DeerConfig) -> GPTDecoderConfig:
    return GPTDecoderConfig(head=cfg.head, hidden_size=cfg.gpt_hidden_size)


def diffusion_head_config(cfg: DeerConfig) -> DiffusionConfig:
    """DiffusionDecoder construction args (flamingo_mpt.py:168-176:
    feature_dim=head hidden_size, input_dim=out_features+1=7)."""
    return DiffusionConfig(
        input_dim=cfg.head.out_features + 1,
        horizon=cfg.diff_horizon,
        global_cond_dim=cfg.head.hidden_size,
        down_dims=tuple(cfg.diff_down_dims),
        n_groups=min(8, min(cfg.diff_down_dims)),
        n_timesteps=cfg.diff_timesteps,
        predict_epsilon=cfg.diff_predict_epsilon)


def init_any_head(key, cfg: DeerConfig, dtype=jnp.float32) -> dict:
    ht = cfg.head_type
    if ht == "deterministic":
        return init_head(key, cfg.head, dtype)
    if ht == "diffusion":
        # LSTM feature extractor only — use_diff DeterministicDecoders have
        # no action/gripper MLPs (action_head.py:364-371)
        return init_head(key, cfg.head, dtype, features_only=True)
    if ht == "fc":
        return init_fc_decoder(key, cfg.head, dtype)
    if ht == "gpt":
        return init_gpt_decoder(key, gpt_head_config(cfg), dtype)
    raise ValueError(cfg.head_type)


def any_head_forward(p: dict, feat: jnp.ndarray, cfg: DeerConfig,
                     state: Optional[jnp.ndarray] = None,
                     *, window: Optional[int] = None,
                     last_action: bool = False,
                     dropout_rng=None, train: bool = False):
    """Full-window mode.  Returns HeadOutput (deterministic/fc/gpt) or
    LSTM features (B, W, hidden) for diffusion."""
    ht = cfg.head_type
    if ht == "deterministic":
        return head_forward(p, feat, cfg.head, state, window=window,
                            last_action=last_action, dropout_rng=dropout_rng,
                            train=train)
    if ht == "diffusion":
        y = head_features(p, feat, cfg.head, state, window=window)
        return y[:, -1:] if last_action else y
    if ht == "fc":
        out = fc_decoder_forward(p, feat, cfg.head, window=window,
                                 state=state, dropout_rng=dropout_rng,
                                 train=train)
        if last_action:
            out = HeadOutput(out.actions[:, -1:], out.gripper_probs[:, -1:],
                             out.gripper_logits[:, -1:])
        return out
    if ht == "gpt":
        # state is NOT consumed: the reference GPTDecoder.forward takes no
        # state argument (action_head.py:678-710); check_head_type refuses
        # gpt + use_state loudly instead of dropping proprio silently
        return gpt_decoder_forward(p, feat, gpt_head_config(cfg),
                                   window=window, last_action=last_action,
                                   dropout_rng=dropout_rng, train=train)
    raise ValueError(ht)


def any_head_step(p: dict, feat: jnp.ndarray, carry, cfg: DeerConfig,
                  state: Optional[jnp.ndarray] = None
                  ) -> Tuple[HeadOutput, object]:
    """Streaming mode: one frame -> (HeadOutput with W==1, new carry).

    For diffusion, HeadOutput.actions carries the (B, 1, hidden) conditioning
    feature (zeros in the gripper slots); the DDPM sampler downstream maps it
    to an action plan.
    """
    ht = cfg.head_type
    if ht == "deterministic":
        return head_step(p, feat, carry, cfg.head, state)
    if ht == "diffusion":
        y, new_carry = head_feature_step(p, feat, carry, cfg.head, state)
        z = jnp.zeros((y.shape[0], 1, 1), y.dtype)
        return HeadOutput(y[:, None, :], z, z), new_carry
    if ht == "fc":
        out = fc_decoder_forward(p, feat, cfg.head, window=1, state=state)
        return out, ()
    if ht == "gpt":
        gcfg = gpt_head_config(cfg)
        if carry is None:
            carry = gpt_zero_carry(gcfg, feat.shape[0])
        return gpt_decoder_step(p, feat, carry, gcfg)
    raise ValueError(ht)


def any_zero_carry(cfg: DeerConfig, batch: int, dtype=jnp.float32):
    ht = cfg.head_type
    if ht in ("deterministic", "diffusion"):
        return zero_carry(cfg.head.lstm_num_layers, batch,
                          cfg.head.hidden_size, dtype)
    if ht == "gpt":
        return gpt_zero_carry(gpt_head_config(cfg), batch, dtype)
    return ()  # fc: stateless


def head_action_width(cfg: DeerConfig) -> int:
    """Width of the per-step 'action' vector the exit criterion compares:
    6k arm dims normally, the feature dim for diffusion (see module doc)."""
    if cfg.head_type == "diffusion":
        return cfg.head.hidden_size
    return cfg.head.out_features * cfg.head.multi_step_action
