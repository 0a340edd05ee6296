"""Multi-exit imitation loss — port of train_utils.py:487-558.

Per exit: huber(arm actions) (mean over action dim) + lambda * BCE-with-logits
(gripper), lambda = 0.01 for CALVIN / 0.05 for real data
(train_utils.py:532-536).  Exit losses get uniform normalized-to-1 weights
(get_exit_weights train_utils.py:179 returns ones; the reference then *sums*,
so effectively sum of per-exit means — we reproduce exactly that).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
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


def multi_exit_diffusion_loss(outputs: TrainOutputs, labels: jnp.ndarray,
                              diff_params: dict, cfg, rng
                              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Multi-exit DDPM epsilon-prediction loss for head_type='diffusion'.

    The reference never implements diffusion TRAINING in this repo (its
    multi-exit loop raises NotImplementedError for non-deterministic heads,
    train_utils.py:301; only the normalizer fit
    train_calvin_post_strategy.py:457-461 and the SAMPLING branch
    eval_utils.py:388-419 exist).  This objective is therefore designed to
    match the serving contract exactly:

      serving inpaints the first hist = n_obs_steps-1 rows of a
      horizon-length sequence with the executed-action history, conditions
      the U-Net on the current frame's LSTM feature, samples, and executes
      rows [hist:] (eval_utils.py:400-415).

    So per exit: x_start = normalizer(labels) placed in rows [0, W) of the
    horizon, cond_mask clamps rows [0, hist) (zero loss there), the
    epsilon-MSE is taken over rows [hist, W) (rows >= W are padding, also
    masked), and global_cond is the exit's LSTM feature at row hist — the
    feature of the frame being acted from.  One shared (t, noise) draw per
    batch row keeps the E exits comparable; the U-Net runs once with batch
    E*B.

    outputs: TrainOutputs whose per-exit entries are (B, W, hidden) feature
    tensors (any_head_forward diffusion route).  labels: (B, W, 7).
    """
    from deer_vla_tpu.models.diffusion import ddpm_buffers, q_sample, \
        unet_forward
    from deer_vla_tpu.models.heads import diffusion_head_config

    dcfg = diffusion_head_config(cfg)
    buf = ddpm_buffers(dcfg)
    assert labels.ndim == 3, "diffusion head: multi_step_action must be 1"
    b, w, adim = labels.shape
    hist = cfg.n_obs_steps - 1
    horizon = dcfg.horizon

    norm = jax.lax.stop_gradient(diff_params["norm"])
    x_start = labels.astype(jnp.float32) * norm["scale"] + norm["offset"]
    x_full = jnp.pad(x_start, ((0, 0), (0, horizon - w), (0, 0)))
    rows = jnp.arange(horizon)
    cond_mask = (rows < hist)[None, :, None]           # clamped history
    loss_mask = ((rows >= hist) & (rows < w))[None, :, None]

    feats = jnp.stack([o for o in list(outputs.exit_outputs)
                       + [outputs.final_output, outputs.extra_output,
                          outputs.extra_output2]])     # (E, B, W, H)
    e = feats.shape[0]
    global_cond = feats[:, :, hist].astype(jnp.float32)  # (E, B, H)

    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, dcfg.n_timesteps)
    noise = jax.random.normal(rng_n, x_full.shape, jnp.float32)
    x_noisy = q_sample(buf, x_full, t, noise)
    x_noisy = jnp.where(cond_mask, x_full, x_noisy)

    # one U-Net call over all exits: tile the (identical) noisy sample
    x_tiled = jnp.tile(x_noisy, (e, 1, 1))
    t_tiled = jnp.tile(t, (e,))
    pred = unet_forward(diff_params["unet"], x_tiled, t_tiled, dcfg,
                        global_cond.reshape(e * b, -1))
    target = noise if dcfg.predict_epsilon else x_full
    err = jnp.square(pred.reshape(e, b, horizon, adim) - target[None])
    err = jnp.where(loss_mask[None], err, 0.0)
    denom = loss_mask.sum() * adim * b
    per_exit = err.sum(axis=(1, 2, 3)) / jnp.maximum(denom, 1)  # (E,)
    total = per_exit.sum()
    metrics = {
        "loss": total,
        "diffusion_mse": per_exit.mean(),
        "extra_exit_loss_num": per_exit[-2],
        "extra_exit_loss2_num": per_exit[-1],
        "per_exit_loss": per_exit,
    }
    return total, metrics
