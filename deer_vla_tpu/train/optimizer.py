"""AdamW with the reference's parameter-group rules, via optax masks.

Port of get_grouped_params (train_calvin_post_strategy.py:466-525):
  * weight decay ONLY on gated-x-attn matrices (plus heads when exit_decay),
    never on gates / norms / biases
  * head params get lr * exit_lr_scale during joint training
  * exit-only phase trains heads only at exit_learning_rate
  * adaptive lr: base_lr * (batch/6) * (world_size/8)
    (train_calvin_post_strategy.py:527-529)
  * schedulers: constant/linear/cosine with warmup (HF-style).
Gradient clipping (global norm 1.0, train_utils.py:570) is part of the chain.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from deer_vla_tpu.core.config import DeerConfig


# ---------------------------------------------------------------------------
# path predicates (mirror the reference's name-based rules)
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def is_head_path(ps: str) -> bool:
    # 'diffusion' (the DDPM U-Net) trains alongside the heads in both
    # phases (factory.py:232 diffusion_model.requires_grad_(True)); its
    # 'norm' buffer is excluded by the trainable mask, not here
    return ("'lm_head'" in ps) or ("'lm_exits'" in ps) \
        or ("'extra_exit'" in ps) or ("'diffusion'" in ps)


def is_xattn_path(ps: str) -> bool:
    return "'xattn'" in ps


def apply_decay_path(ps: str, exit_decay: bool = False) -> bool:
    base = is_xattn_path(ps) or (exit_decay and is_head_path(ps))
    return (base
            and "ff_gate" not in ps
            and "attn_gate" not in ps
            and "norm" not in ps and "'ln" not in ps and "ln'" not in ps
            and "bias" not in ps and "'b'" not in ps
            and "scale" not in ps)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def make_schedule(kind: str, base_lr: float, warmup_steps: int,
                  total_steps: int) -> optax.Schedule:
    if kind == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, base_lr, warmup_steps),
            optax.linear_schedule(base_lr, 0.0, max(1, total_steps - warmup_steps)),
        ], [warmup_steps])
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_steps, max(total_steps, warmup_steps + 1), 0.0)
    # constant with warmup (default, train_calvin_post_strategy.py)
    return optax.join_schedules([
        optax.linear_schedule(0.0, base_lr, warmup_steps),
        optax.constant_schedule(base_lr),
    ], [warmup_steps])


def adaptive_lr(base_lr: float, batch_size: int, world_size: int) -> float:
    return base_lr * (batch_size / 6.0) * (world_size / 8.0)


# ---------------------------------------------------------------------------
# optimizer factory
# ---------------------------------------------------------------------------


def make_optimizer(params, cfg: DeerConfig, *, phase: str,
                   learning_rate: float, warmup_steps: int, total_steps: int,
                   scheduler: str = "constant", weight_decay: float = 0.1,
                   exit_lr_scale: float = 1.0, exit_decay: bool = False,
                   trainable: Optional[dict] = None,
                   clip_norm: float = 1.0) -> optax.GradientTransformation:
    """Build the phase optimizer.

    phase='joint': backbone(+heads, lr-scaled) — reference joint_optimizer.
    phase='exit_only': heads only — reference exit_optimizer.
    ``trainable`` (bool pytree) zeroes updates for frozen leaves.
    """
    sched = make_schedule(scheduler, learning_rate, warmup_steps, total_steps)

    def leaf_label(path, leaf) -> str:
        ps = _path_str(path)
        head = is_head_path(ps)
        if phase == "exit_only" and not head:
            return "frozen"
        decay = apply_decay_path(ps, exit_decay)
        scale = head and phase == "joint" and exit_lr_scale != 1.0
        return f"{'wd' if decay else 'nowd'}{'_scaled' if scale else ''}"

    labels = jax.tree_util.tree_map_with_path(leaf_label, params)
    if trainable is not None:
        labels = jax.tree_util.tree_map(
            lambda lab, t: lab if t else "frozen", labels, trainable)

    def adamw(wd: float, scale: float):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(
                lambda step: sched(step) * scale),
        )

    transforms = {
        "wd": adamw(weight_decay, 1.0),
        "nowd": adamw(0.0, 1.0),
        "wd_scaled": adamw(weight_decay, exit_lr_scale),
        "nowd_scaled": adamw(0.0, exit_lr_scale),
        "frozen": optax.set_to_zero(),
    }
    # zero FROZEN grads before the global-norm clip: torch's
    # clip_grad_norm_ (train_utils.py:570) sees only requires_grad params
    # (frozen .grad is None), so the reference's clip norm is the TRAINABLE
    # norm.  Without this mask, joint-phase frozen decoder-block grads
    # (real, nonzero — only the ViT is stop-gradiented in the forward)
    # dominate the norm and silently over-clip every trainable update.
    frozen = jax.tree_util.tree_map(lambda lab: lab == "frozen", labels)
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen),
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(transforms, labels),
    )
