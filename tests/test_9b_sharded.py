"""BASELINE config[3]: "9B (MPT-7B) DeeR-B/S dynamic exit sharded over a
v5e-4 mesh".  Exercised on the virtual mesh with the 9B TOPOLOGY (x-attn
every 4 layers, exit grid, head/tp-divisible dims; width scaled down so the
eager CPU reference run stays light): tp=4 Megatron-style sharding of
attention/MLP weights must produce the same actions as replicated
execution, through the actual dynamic-exit engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_9b
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.models.flamingo import forward_fixed_exit, init_deer
from deer_vla_tpu.parallel.mesh import make_mesh
from deer_vla_tpu.parallel.sharding import shard_params


@pytest.fixture(scope="module")
def small9b():
    cfg = deer_9b(max_layer=4, exit_interval=4)  # 9B topology, scaled width
    cfg = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, image_size=28, patch_size=14,
                                width=64, layers=2, heads=4),
        perceiver=dataclasses.replace(cfg.perceiver, dim=64, depth=2,
                                      dim_head=16, heads=4, num_latents=8),
        mpt=dataclasses.replace(cfg.mpt, d_model=512, n_heads=8, n_layers=4,
                                vocab_size=1024),
        head=dataclasses.replace(cfg.head, in_features=512, hidden_size=64,
                                 lstm_num_layers=2, mlp_hidden_dims=(32, 16),
                                 mlp_num_hidden_layers=2, window_size=4),
        text_len=8,
    )
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_9b_layout(small9b):
    cfg, params = small9b
    assert cfg.mpt.d_model % 4 == 0 and cfg.mpt.n_heads % 4 == 0
    # x-attn every 4 layers: only layer 3 has one (flamingo_lm.py:176)
    assert [x is not None for x in params["decoder"]["xattn"]] == \
        [False, False, False, True]
    assert cfg.all_exit_ids() == (3,)


def test_9b_tp4_matches_replicated(small9b):
    cfg, params = small9b
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((1, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((1, cfg.text_len), jnp.int32)

    out_ref, _ = forward_fixed_exit(params, img, ids, mask, cfg, exit_id=3,
                                    vision_gripper=img)

    mesh = make_mesh(dp=2, fsdp=1, tp=4)
    p_tp, shardings = shard_params(params, mesh, fsdp=False, tp=True,
                                   min_size=10 ** 12)
    assert "tp" in str(shardings["decoder"]["blocks"][0]["wqkv"]["w"].spec)
    out_tp, _ = forward_fixed_exit(p_tp, img, ids, mask, cfg, exit_id=3,
                                   vision_gripper=img)
    # deer_9b computes in bf16; tp partitioning changes matmul reduction
    # order, so agreement is at bf16 resolution (~1e-3), not fp32
    np.testing.assert_allclose(np.asarray(out_tp.actions),
                               np.asarray(out_ref.actions),
                               rtol=4e-3, atol=4e-3)


def test_9b_tp2_train_step_wide():
    """Sharded TRAIN dryrun at production-like width (d_model 2048, 16
    heads, 9B x-attn topology) on the dp=2 x fsdp=2 x tp=2 virtual mesh:
    tp-sharded matmuls + fsdp param sharding through the full multi-exit
    train step, loss finite and trainable grads nonzero."""
    from deer_vla_tpu.models.flamingo import trainable_mask
    from deer_vla_tpu.parallel.sharding import shard_batch
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_train_step

    cfg = deer_9b(max_layer=2, exit_interval=2)
    cfg = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, image_size=28, patch_size=14,
                                width=128, layers=2, heads=4),
        perceiver=dataclasses.replace(cfg.perceiver, dim=128, depth=1,
                                      dim_head=32, heads=4, num_latents=8),
        mpt=dataclasses.replace(cfg.mpt, d_model=2048, n_heads=16,
                                n_layers=2, vocab_size=2048),
        head=dataclasses.replace(cfg.head, in_features=2048, hidden_size=128,
                                 lstm_num_layers=2, mlp_hidden_dims=(64, 32),
                                 mlp_num_hidden_layers=2, window_size=2),
        text_len=8, window_size=2,
    )
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    params, _ = shard_params(params, mesh, fsdp=True, tp=True, min_size=1024)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-4,
                         warmup_steps=0, total_steps=10, trainable=mask)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, phase="joint", donate=False)
    bs, w, s = 4, cfg.window_size, cfg.text_len
    r = np.random.RandomState(0)
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    batch = shard_batch({
        "image": jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32),
        "gripper": jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((bs * w, s), jnp.int32),
        "labels": jnp.asarray(np.clip(r.randn(bs, w, 7), -1, 1), jnp.float32),
    }, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_9b_dynamic_engine_tp(small9b):
    """The while-loop dynamic engine runs with tp-sharded params."""
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = small9b
    mesh = make_mesh(dp=2, fsdp=1, tp=4)
    p_tp, _ = shard_params(params, mesh, fsdp=False, tp=True, min_size=10 ** 12)
    pol = ScanDeerPolicy(p_tp, cfg, thresholds=[1e8])
    r = np.random.RandomState(1)
    img = jnp.asarray(r.randn(1, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((1, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    a = pol.step(img, img, jnp.asarray(ids), jnp.ones((1, cfg.text_len), jnp.int32))
    assert pol.last_exit_layer == 3
    assert np.all(np.isfinite(a))
