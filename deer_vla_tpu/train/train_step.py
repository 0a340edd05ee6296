"""jit/pjit multi-exit training step.

Replaces the DDP loop body (train_utils.py:385-628): under jit with a
dp-sharded batch and replicated (or fsdp-sharded) params, XLA inserts the
gradient all-reduce that DDP's NCCL hook provided.  bf16 compute, fp32 master
params and Adam state; no GradScaler (bf16 doesn't need loss scaling).
Gradient accumulation is a host-side micro-batch loop in the trainer
(train_utils.py:573-583 equivalent).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import forward_train
from deer_vla_tpu.train.losses import (multi_exit_diffusion_loss,
                                       multi_exit_loss)


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jnp.ndarray


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _split_micro(batch: Dict, grad_accum: int, cfg: DeerConfig) -> Dict:
    """Reshape leading dims to (k, .../k, ...) for lax.scan microbatching.

    Per-frame leaves are (B*W, ...) -> (k, mb*W, ...).  Per-WINDOW leaves —
    labels always, and text rows under vit_concat (the window is folded into
    the media tokens, forward_train docstring) — are (B, ...) -> (k, mb, ...).
    """
    w = cfg.window_size
    bs = batch["labels"].shape[0]
    assert bs % grad_accum == 0, (bs, grad_accum)
    mb = bs // grad_accum
    per_window = {"labels"}
    if cfg.fusion_mode == "vit_concat":
        per_window |= {"input_ids", "attention_mask"}

    def per_leaf(key, x):
        if key in per_window:
            return x.reshape(grad_accum, mb, *x.shape[1:])
        return x.reshape(grad_accum, mb * w, *x.shape[1:])

    return {k: per_leaf(k, v) for k, v in batch.items()}


def _apply_update(optimizer, state: TrainState, grads, loss, metrics,
                  trainable) -> Tuple[TrainState, Dict]:
    """Optimizer update + the shared metrics block."""
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["loss"] = loss
    # TRAINABLE-grad norm — what the reference's clip_grad_norm_ returns
    # (frozen params have .grad None there); raw grads carry real nonzero
    # frozen-decoder gradients in the joint phase
    if trainable is not None:
        gn = jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.zeros_like(g), grads, trainable)
    else:
        gn = grads
    metrics["grad_norm"] = optax.global_norm(gn)
    return TrainState(new_params, new_opt, state.step + 1), metrics


def make_train_step(cfg: DeerConfig, optimizer: optax.GradientTransformation,
                    *, phase: str = "joint", bin_coef: float = 0.01,
                    calvin_multiplier: float = 1.0,
                    donate: bool = True, grad_accum: int = 1,
                    trainable=None):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics).

    batch dict (leading dim B*W except labels):
      image, gripper: (B*W, 1, 1, 3, H, W)
      input_ids, attention_mask: (B*W, S)
      labels: (B, W, 7)
      state (optional): (B*W, state_dim)

    grad_accum > 1 splits the batch into k microbatches along the trajectory
    dim and accumulates (averages) gradients over a lax.scan before the
    single optimizer update — the reference's host-side
    gradient_accumulation_steps (train_utils.py:573-583), traded for one
    fused program and k-x lower peak activation memory.
    """
    exit_only = phase == "exit_only"

    def loss_fn(params, batch, rng):
        out = forward_train(
            params, batch["image"], batch["input_ids"],
            batch["attention_mask"], cfg, rng,
            vision_gripper=batch.get("gripper"),
            state_tensor=batch.get("state"),
            no_backbone_grad=exit_only, train=True)
        if cfg.head_type == "diffusion":
            # DDPM epsilon loss on per-exit LSTM features (the reference
            # leaves this unimplemented, train_utils.py:301 — see
            # losses.multi_exit_diffusion_loss).  fold_in keeps the
            # forward_train rng stream identical to the other head types.
            drng = jax.random.fold_in(rng, 99)
            dloss, dmetrics = multi_exit_diffusion_loss(
                out, batch["labels"], params["diffusion"], cfg, drng)
            return calvin_multiplier * dloss, dmetrics
        loss, metrics = multi_exit_loss(
            out, batch["labels"], bin_coef,
            last_step_only=cfg.use_hist or cfg.fusion_mode == "vit_concat")
        # the logged "loss" is the scaled backward loss (the reference's
        # logged loss_calvin is also post-multiplier, train_utils.py:549);
        # per-exit metric entries stay unscaled
        return calvin_multiplier * loss, metrics

    def step_fn(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        if grad_accum == 1:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
        else:
            micro = _split_micro(batch, grad_accum, cfg)

            def scan_body(acc, xs):
                mb, mrng = xs
                (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, mrng)
                acc_g, acc_l = acc
                return (jax.tree_util.tree_map(jnp.add, acc_g, g),
                        acc_l + l), m

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, grad_accum)
            (grads, loss_sum), ms = jax.lax.scan(
                scan_body, (zero_g, jnp.zeros(())), (micro, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
            loss = loss_sum / grad_accum
            metrics = jax.tree_util.tree_map(lambda x: x.mean(0), ms)
        return _apply_update(optimizer, state, grads, loss, metrics,
                             trainable)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_cotrain_step(cfg: DeerConfig, optimizer: optax.GradientTransformation,
                      *, phase: str = "joint", bin_coef: float = 0.01,
                      vl_weight: float = 1.0, calvin_multiplier: float = 1.0,
                      donate: bool = True,
                      grad_accum: int = 1, trainable=None):
    """Co-training step (--cotrain, train_calvin_post_strategy.py:296-302):
    one update from the CALVIN imitation loss PLUS the vision-language LM
    loss on a caption/VQA batch, computed in a single program.

    vl_batch: {image (B, 1, 1, 3, H, W), input_ids, attention_mask,
               [answer_mask]}.

    grad_accum > 1 microbatches BOTH batches along their batch dims (same
    lax.scan accumulation as make_train_step); the VL batch size must be
    divisible by grad_accum too.
    """
    from deer_vla_tpu.train.pretrain import lm_loss

    exit_only = phase == "exit_only"

    def loss_fn(params, batch, vl_batch, rng):
        out = forward_train(
            params, batch["image"], batch["input_ids"],
            batch["attention_mask"], cfg, rng,
            vision_gripper=batch.get("gripper"),
            state_tensor=batch.get("state"),
            no_backbone_grad=exit_only, train=True)
        calvin_loss, metrics = multi_exit_loss(
            out, batch["labels"], bin_coef,
            last_step_only=cfg.use_hist or cfg.fusion_mode == "vit_concat")
        vl, vl_metrics = lm_loss(params, cfg, vl_batch["image"],
                                 vl_batch["input_ids"],
                                 vl_batch["attention_mask"],
                                 loss_mask=vl_batch.get("answer_mask"))
        metrics = dict(metrics)
        metrics.update(vl_metrics)
        return calvin_multiplier * calvin_loss + vl_weight * vl, metrics

    def _split_vl(vl_batch: Dict) -> Dict:
        bs = next(iter(vl_batch.values())).shape[0]
        assert bs % grad_accum == 0, ("vl batch", bs, grad_accum)
        mb = bs // grad_accum
        return {k: v.reshape(grad_accum, mb, *v.shape[1:])
                for k, v in vl_batch.items()}

    def step_fn(state: TrainState, batch, vl_batch, rng):
        if grad_accum == 1:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, vl_batch, rng)
        else:
            micro = _split_micro(batch, grad_accum, cfg)
            vl_micro = _split_vl(vl_batch)

            def scan_body(acc, xs):
                mb, vmb, mrng = xs
                (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, vmb, mrng)
                acc_g, acc_l = acc
                return (jax.tree_util.tree_map(jnp.add, acc_g, g),
                        acc_l + l), m

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, grad_accum)
            (grads, loss_sum), ms = jax.lax.scan(
                scan_body, (zero_g, jnp.zeros(())), (micro, vl_micro, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
            loss = loss_sum / grad_accum
            metrics = jax.tree_util.tree_map(lambda x: x.mean(0), ms)
        return _apply_update(optimizer, state, grads, loss, metrics,
                             trainable)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
