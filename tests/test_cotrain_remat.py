"""Co-training step, remat, and stage-reuse scan policy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer, trainable_mask


def make_batches(cfg, bs=2, seed=0):
    r = np.random.RandomState(seed)
    w, s, hw = cfg.window_size, cfg.text_len, cfg.vit.image_size
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    batch = {
        "image": jnp.asarray(r.randn(bs * w, 1, 1, 3, hw, hw), jnp.float32),
        "gripper": jnp.asarray(r.randn(bs * w, 1, 1, 3, hw, hw), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((bs * w, s), jnp.int32),
        "labels": jnp.asarray(np.clip(r.randn(bs, w, 7), -1, 1), jnp.float32),
    }
    vids = np.full((bs, s), 9, np.int32)
    vids[:, 0] = cfg.media_token_id
    vl_batch = {
        "image": jnp.asarray(r.randn(bs, 1, 1, 3, hw, hw), jnp.float32),
        "input_ids": jnp.asarray(vids),
        "attention_mask": jnp.ones((bs, s), jnp.int32),
    }
    return batch, vl_batch


def test_cotrain_step():
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_cotrain_step

    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=10, trainable=mask)
    step = make_cotrain_step(cfg, opt, donate=False)
    batch, vl_batch = make_batches(cfg)
    st, m = step(init_train_state(params, opt), batch, vl_batch,
                 jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["lm_loss"])) and float(m["lm_loss"]) > 0
    # lm loss contributes to the wte gradient (embeddings trainable in joint)
    d = np.max(np.abs(np.asarray(st.params["decoder"]["wte"]["w"])
                      - np.asarray(params["decoder"]["wte"]["w"])))
    assert d > 0


def test_remat_matches_no_remat():
    from deer_vla_tpu.models.flamingo import forward_train
    from deer_vla_tpu.train.losses import multi_exit_loss

    cfg = deer_tiny()
    cfg_r = dataclasses.replace(cfg, remat_layers=True)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batches(cfg)

    def loss(c):
        def f(p):
            out = forward_train(p, batch["image"], batch["input_ids"],
                                batch["attention_mask"], c, jax.random.PRNGKey(2),
                                vision_gripper=batch["gripper"], train=False)
            return multi_exit_loss(out, batch["labels"])[0]
        return f

    l1, g1 = jax.value_and_grad(loss(cfg))(params)
    l2, g2 = jax.value_and_grad(loss(cfg_r))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    a = jax.tree_util.tree_leaves(g1)
    b = jax.tree_util.tree_leaves(g2)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_scan_policy_stage_reuse():
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    # thresholds make step-0 exit at the LAST layer
    pol = ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8], steps_per_stage=2)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((1, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, cfg.text_len), jnp.int32)

    pol.set_timestep(0)
    pol.step(img, img, ids, mask)
    first = pol.last_exit_layer
    assert first == cfg.all_exit_ids()[-1]
    # mid-stage: must reuse the SAME exit even if thresholds would now allow
    # an earlier one
    pol.set_thresholds([1e8, 1e8])  # would exit at layer 1 if re-evaluated
    pol.set_timestep(1)
    pol.step(img, img, ids, mask)
    assert pol.last_exit_layer == first
    # new stage: re-evaluate -> earlier exit now fires
    pol.set_timestep(2)
    pol.step(img, img, ids, mask)
    assert pol.last_exit_layer == cfg.all_exit_ids()[0]
