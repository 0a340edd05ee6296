"""Regression tests for the round-2 core-file review findings: frozen-grad
clip dilution, state-less calibration, vit_concat microbatching, max_layer
below the first exit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer, trainable_mask


def test_clip_norm_ignores_frozen_grads():
    """The global-norm clip must see only TRAINABLE grads (torch's
    clip_grad_norm_ skips requires_grad=False params whose .grad is None);
    huge frozen-decoder grads must not shrink trainable updates."""
    from deer_vla_tpu.train.optimizer import make_optimizer
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=100, trainable=mask)
    state = opt.init(params)

    def grads_with_frozen_scale(s):
        return jax.tree_util.tree_map(
            lambda p, m: jnp.full_like(p, 1e-3) if m
            else jnp.full_like(p, s), params, mask)

    u_small, _ = opt.update(grads_with_frozen_scale(0.0), state, params)
    u_huge, _ = opt.update(grads_with_frozen_scale(1e6), state, params)
    # trainable updates identical whether frozen grads are 0 or 1e6
    a = np.asarray(u_small["extra_exit"]["rnn"]["layers"][0]["wi"])
    b = np.asarray(u_huge["extra_exit"]["rnn"]["layers"][0]["wi"])
    np.testing.assert_allclose(a, b, rtol=1e-6)
    assert np.abs(a).max() > 0
    # frozen leaves still receive zero updates
    fz = np.asarray(u_huge["decoder"]["blocks"][0]["wqkv"]["w"])
    assert np.abs(fz).max() == 0


def test_grad_norm_metric_is_trainable_only():
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import (init_train_state,
                                               make_train_step)
    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.train.trainer import prepare_batch, TrainConfig
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=10, trainable=mask)
    tcfg = TrainConfig(rgb_pad=2, gripper_pad=2, batch_size=2)
    loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                          img_hw=cfg.vit.image_size,
                          grip_hw=cfg.vit.image_size)
    raw = next(iter(loader))
    batch = prepare_batch(raw, cfg, jax.random.PRNGKey(1), tcfg)
    step = make_train_step(cfg, opt, phase="joint", trainable=mask,
                           donate=False)
    state = init_train_state(params, opt)
    _, m_masked = step(state, batch, jax.random.PRNGKey(2))
    step_raw = make_train_step(cfg, opt, phase="joint", donate=False)
    _, m_raw = step_raw(state, batch, jax.random.PRNGKey(2))
    # the joint phase produces REAL frozen-decoder grads, so the raw norm
    # strictly exceeds the trainable-only norm
    assert float(m_masked["grad_norm"]) < float(m_raw["grad_norm"])
    assert float(m_masked["grad_norm"]) > 0


def test_vit_concat_grad_accum_microbatching():
    """_split_micro must keep per-WINDOW leaves (text rows under vit_concat)
    at (k, mb, S) — the old reshape assumed every leaf had B*W rows and
    crashed at trace time."""
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import (init_train_state,
                                               make_train_step)
    cfg = deer_tiny(window_size=2)
    cfg = dataclasses.replace(cfg, fusion_mode="vit_concat")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=10, trainable=mask)
    b, w, hw, s = 4, cfg.window_size, cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    ids = np.full((b, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    batch = {
        "image": jnp.asarray(r.randn(b * w, 1, 1, 3, hw, hw), jnp.float32),
        "gripper": jnp.asarray(r.randn(b * w, 1, 1, 3, hw, hw), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.asarray(np.clip(r.randn(b, w, 7), -1, 1), jnp.float32),
    }
    step = make_train_step(cfg, opt, phase="joint", grad_accum=2,
                           trainable=mask, donate=False)
    state = init_train_state(params, opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_calibration_consumes_proprio_state():
    """--use_state models: the calibration deltas must depend on robot_obs
    (the criterion runs the same state-conditioned forward as serving)."""
    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.calibrate import generate_calibration_values
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(
        cfg, media_token_id=tok.media_token_id, use_state=True,
        head=dataclasses.replace(cfg.head, use_state=True))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    batch = next(iter(DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                                   img_hw=cfg.vit.image_size,
                                   grip_hw=cfg.vit.image_size)))
    v1 = generate_calibration_values(params, cfg, [batch])
    b2 = dict(batch, robot_obs=batch["robot_obs"] + 3.0)
    v2 = generate_calibration_values(params, cfg, [b2])
    assert v1.shape == v2.shape
    assert not np.allclose(v1, v2), \
        "calibration deltas ignored robot_obs for a use_state model"


def test_scan_engine_rejects_max_layer_below_first_exit():
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg = deer_tiny()  # exits at layers 1 and 3
    params = init_deer(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="below the first exit"):
        ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8], max_layer=1)


def test_checkpoint_write_is_atomic(tmp_path):
    """No stray .tmp files; the written ckpt round-trips."""
    from deer_vla_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    p = save_checkpoint(str(tmp_path / "c"), params, cfg, meta={"seed": 1})
    import os
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    loaded, _, meta = load_checkpoint(p, params)
    assert meta["meta"]["seed"] == 1
