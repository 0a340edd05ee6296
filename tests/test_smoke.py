"""End-to-end smoke tests on the tiny config: init + forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import (forward_fixed_exit, forward_train,
                                          init_deer, trainable_mask)
from deer_vla_tpu.ops.layers import count_params


@pytest.fixture(scope="module")
def tiny():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, bs=2, rng=0):
    r = np.random.RandomState(rng)
    w = cfg.window_size
    n = bs * w
    img = r.randn(n, 1, 1, 3, cfg.vit.image_size, cfg.vit.image_size).astype(np.float32)
    grip = r.randn(n, 1, 1, 3, cfg.vit.image_size, cfg.vit.image_size).astype(np.float32)
    ids = r.randint(0, 100, (n, cfg.text_len)).astype(np.int32)
    ids[:, 0] = cfg.media_token_id
    mask = np.ones((n, cfg.text_len), np.int32)
    mask[:, -2:] = 0
    return jnp.asarray(img), jnp.asarray(grip), jnp.asarray(ids), jnp.asarray(mask)


def test_init_shapes(tiny):
    cfg, params = tiny
    assert count_params(params) > 0
    assert cfg.all_exit_ids() == (1, 3)
    assert set(params["lm_exits"].keys()) == {"1"}


def test_forward_train(tiny):
    cfg, params = tiny
    img, grip, ids, mask = make_batch(cfg)
    out = forward_train(params, img, ids, mask, cfg, jax.random.PRNGKey(1),
                        vision_gripper=grip, train=False)
    bs, w = 2, cfg.window_size
    assert out.final_output.actions.shape == (bs, w, 6)
    assert out.final_output.gripper_logits.shape == (bs, w, 1)
    assert len(out.exit_outputs) == len(cfg.exit_layer_ids())
    assert out.hidden_states.shape == (cfg.n_layers, bs * w, cfg.text_len, cfg.lang_dim)
    assert out.extra_output.actions.shape == (bs, w, 6)
    assert out.rand_layer_ids.shape == (bs, w)
    # sampled layers must be actual exit layers
    assert set(np.unique(np.asarray(out.rand_layer_ids))) <= set(cfg.all_exit_ids())
    assert np.all(np.isfinite(np.asarray(out.final_output.actions)))
    assert np.all(np.abs(np.asarray(out.final_output.actions)) <= 1.0)


def test_fixed_exit_runs_fewer_layers(tiny):
    cfg, params = tiny
    img, grip, ids, mask = make_batch(cfg, bs=1)
    img, grip, ids, mask = img[:1], grip[:1], ids[:1], mask[:1]
    out1, carry1 = forward_fixed_exit(params, img, ids, mask, cfg, exit_id=1,
                                      vision_gripper=grip)
    out2, carry2 = forward_fixed_exit(params, img, ids, mask, cfg, exit_id=3,
                                      vision_gripper=grip)
    assert out1.actions.shape == (1, 1, 6)
    # different depth -> different features -> different action
    assert not np.allclose(np.asarray(out1.actions), np.asarray(out2.actions))
    # carry advances
    assert not np.allclose(np.asarray(carry1[0]), 0.0)


def test_streaming_carry_consistency(tiny):
    """Feeding a window step-by-step with carries must equal the windowed
    LSTM forward (train window mode vs streaming inference parity)."""
    cfg, params = tiny
    from deer_vla_tpu.models.action_head import head_forward, head_step
    r = np.random.RandomState(0)
    bs, w, d = 2, cfg.window_size, cfg.head.in_features
    feat = jnp.asarray(r.randn(bs * w, 5, d).astype(np.float32))
    out = head_forward(params["lm_head"], feat, cfg.head, window=w)
    feat_bw = feat.reshape(bs, w, 5, d)
    carry = None
    for t in range(w):
        step_out, carry = head_step(params["lm_head"], feat_bw[:, t], carry, cfg.head)
    np.testing.assert_allclose(np.asarray(step_out.actions[:, 0]),
                               np.asarray(out.actions[:, -1]), rtol=2e-5, atol=2e-5)


def test_trainable_mask(tiny):
    cfg, params = tiny
    mask = trainable_mask(params, cfg, "joint")
    leaves_p = jax.tree_util.tree_leaves_with_path(params)
    leaves_m = jax.tree_util.tree_leaves(mask)
    assert len(leaves_p) == len(leaves_m)
    d = {jax.tree_util.keystr(p): m for (p, _), m in zip(leaves_p, leaves_m)}
    assert not any(v for k, v in d.items() if "'vit'" in k)
    assert all(v for k, v in d.items() if "'extra_exit'" in k)
    assert any(v for k, v in d.items() if "'xattn'" in k)
    mask2 = trainable_mask(params, cfg, "exit_only")
    d2 = {jax.tree_util.keystr(p): m for (p, _), m in
          zip(leaves_p, jax.tree_util.tree_leaves(mask2))}
    assert not any(v for k, v in d2.items() if "'xattn'" in k or "'perceiver'" in k)
    assert all(v for k, v in d2.items() if "'lm_head'" in k)


def test_share_exit_single_head():
    """share_exit: one physical head serves every exit — sharing resolved at
    use time (aliasing pytree subtrees would untie after one update)."""
    import dataclasses
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.models.flamingo import forward_train, init_deer, resolve_head
    cfg = dataclasses.replace(deer_tiny(), share_exit=True)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    assert "extra_exit" not in params and params["lm_exits"] == {}
    assert resolve_head(params, cfg, 1) is params["lm_head"]
    img, grip, ids, mask = make_batch(cfg)
    out = forward_train(params, img, ids, mask, cfg, jax.random.PRNGKey(1),
                        vision_gripper=grip, train=False)
    # all heads shared: internal exit outputs come from the same weights
    assert len(out.exit_outputs) == len(cfg.exit_layer_ids())
    assert np.all(np.isfinite(np.asarray(out.extra_output.actions)))
