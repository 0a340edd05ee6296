"""Flamingo LM pretraining / VL co-training step.

TPU-native equivalent of the upstream open_flamingo training tree
(open_flamingo/train/train.py:51-350: LAION/MMC4 interleaved next-token
training with DDP/FSDP) and of DeeR's `--cotrain` option
(train_calvin_post_strategy.py:296-302): images + text through the same
gated-x-attn decoder, cross-entropy on next-token prediction, with media and
pad tokens masked from the loss (upstream masks <image> and <PAD> labels).

Sharding is the same dp x fsdp mesh as the policy trainer — the upstream
FSDP machinery (flamingo.py:202-301 + 1.7k-line optim patch) collapses into
param PartitionSpecs.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import encode_vision
from deer_vla_tpu.models.mpt import decoder_forward, lm_logits


def lm_loss(params: dict, cfg: DeerConfig, vision_x: jnp.ndarray,
            input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
            vision_gripper: Optional[jnp.ndarray] = None,
            loss_mask: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, Dict]:
    """Next-token CE. vision_x: (B, T_img, 1, 3, H, W); input_ids: (B, S).

    loss_mask (B, S) optionally restricts the loss (e.g. VQA answer-only
    masking, vl_dataset.py:138-147); media/pad positions are always excluded.
    """
    media = encode_vision(params, vision_x, vision_gripper, cfg)
    hidden, _ = decoder_forward(params["decoder"], input_ids, attention_mask,
                                media, cfg)
    logits = lm_logits(params["decoder"], hidden[-1], cfg.dtypes.cdt,
                           arch=cfg.mpt.arch)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    valid = attention_mask[:, 1:].astype(bool)
    valid &= targets != cfg.media_token_id
    if loss_mask is not None:
        valid &= loss_mask[:, 1:].astype(bool)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, nll, 0.0).sum() / denom
    acc = jnp.where(valid, (logits.argmax(-1) == targets), False).sum() / denom
    return loss, {"lm_loss": loss, "lm_acc": acc, "tokens": denom}


def make_pretrain_step(cfg: DeerConfig, optimizer: optax.GradientTransformation,
                       donate: bool = True):
    """jitted step(state=(params, opt_state), batch, ...) for interleaved or
    caption/VQA batches: {image (B,T,1,3,H,W) or (B,H,W,3) uint8-preprocessed
    upstream, input_ids, attention_mask, [answer_mask]}."""

    def loss_fn(params, batch):
        return lm_loss(params, cfg, batch["image"], batch["input_ids"],
                       batch["attention_mask"],
                       vision_gripper=batch.get("gripper"),
                       loss_mask=batch.get("answer_mask"))

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
