"""jit/pjit multi-exit training step.

Replaces the DDP loop body (train_utils.py:385-628): under jit with a
dp-sharded batch and replicated (or fsdp-sharded) params, XLA inserts the
gradient all-reduce that DDP's NCCL hook provided.  bf16 compute, fp32 master
params and Adam state; no GradScaler (bf16 doesn't need loss scaling).
Gradient accumulation is a host-side micro-batch loop in the trainer
(train_utils.py:573-583 equivalent).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import forward_train
from deer_vla_tpu.train.losses import multi_exit_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jnp.ndarray


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(cfg: DeerConfig, optimizer: optax.GradientTransformation,
                    *, phase: str = "joint", bin_coef: float = 0.01,
                    donate: bool = True):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics).

    batch dict (leading dim B*W except labels):
      image, gripper: (B*W, 1, 1, 3, H, W)
      input_ids, attention_mask: (B*W, S)
      labels: (B, W, 7)
      state (optional): (B*W, state_dim)
    """
    exit_only = phase == "exit_only"

    def loss_fn(params, batch, rng):
        out = forward_train(
            params, batch["image"], batch["input_ids"],
            batch["attention_mask"], cfg, rng,
            vision_gripper=batch.get("gripper"),
            state_tensor=batch.get("state"),
            no_backbone_grad=exit_only, train=True)
        return multi_exit_loss(out, batch["labels"], bin_coef)

    def step_fn(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
