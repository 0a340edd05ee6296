"""Multi-exit imitation loss — port of train_utils.py:487-558.

Per exit: huber(arm actions) (mean over action dim) + lambda * BCE-with-logits
(gripper), lambda = 0.01 for CALVIN / 0.05 for real data
(train_utils.py:532-536).  Exit losses get uniform normalized-to-1 weights
(get_exit_weights train_utils.py:179 returns ones; the reference then *sums*,
so effectively sum of per-exit means — we reproduce exactly that).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from deer_vla_tpu.models.flamingo import TrainOutputs


def huber(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    err = pred - target
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * err * err, delta * (a - 0.5 * delta))


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def multi_exit_loss(outputs: TrainOutputs, labels: jnp.ndarray,
                    bin_coef: float = 0.01, last_step_only: bool = False
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """labels: (B, W, 7), or (B, W, k, 7) for multi_step_action k>1 —
    [..., :6] arm, [..., 6] gripper in {-1, 1}.

    For k>1 the heads emit flat (B, W, 6k)/(B, W, k) outputs
    (action_head.py multi_step_action); they are reshaped here to line up
    with the (B, W, k, 7) labels (train_utils.py:497-503 reshapes the same
    way on the torch side).

    last_step_only (use_hist / vit_concat variants): loss on the window's
    final step only (train_utils.py:277-279 slices labels[:, [-1]]); both
    label and output windows are sliced to their last position.

    Ordering matches train_utils.py:503:
    [internal exits..., final, extra1, extra2]."""
    if last_step_only:
        labels = labels[:, -1:]
    arm_t = labels[..., :6].astype(jnp.float32)
    grip_t = ((labels[..., 6:] + 1.0) / 2.0).astype(jnp.float32)

    all_outputs = list(outputs.exit_outputs) + [
        outputs.final_output, outputs.extra_output, outputs.extra_output2]

    num = jnp.stack([o.actions.astype(jnp.float32) for o in all_outputs])     # (E, B, W, 6k)
    logits = jnp.stack([o.gripper_logits.astype(jnp.float32) for o in all_outputs])  # (E, B, W, k)
    if last_step_only:
        num = num[:, :, -1:]
        logits = logits[:, :, -1:]

    if labels.ndim == 4:  # multi-step: (B, W, k, 7) labels, flat head outputs
        k = labels.shape[2]
        num = num.reshape(*num.shape[:3], k, 6)          # (E, B, W, k, 6)
        logits = logits[..., None]                       # (E, B, W, k, 1)
        loss_num = huber(num, arm_t[None]).mean((-1, -2))            # (E, B, W)
        loss_bin = bce_with_logits(logits, grip_t[None]).mean((-1, -2))
    else:
        loss_num = huber(num, arm_t[None]).mean(-1)          # (E, B, W)
        loss_bin = bce_with_logits(logits, grip_t[None]).mean(-1)  # (E, B, W)
    per_exit = (loss_num + bin_coef * loss_bin).mean(axis=(1, 2))  # (E,)
    total = per_exit.sum()

    metrics = {
        "loss": total,
        "mse": loss_num.mean(),
        "bce": loss_bin.mean(),
        "extra_exit_loss_num": loss_num[-2].mean(),
        "extra_exit_loss_bin": loss_bin[-2].mean(),
        "extra_exit_loss2_num": loss_num[-1].mean(),
        "extra_exit_loss2_bin": loss_bin[-1].mean(),
        "per_exit_loss": per_exit,
    }
    return total, metrics
