"""Camera-fusion variants (flamingo_mpt.py:585-777): pre / post / two_way /
vit_concat encodes, use_hist frame embeddings, last-step-only loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import (encode_vision, forward_train,
                                          init_deer, trainable_mask)
from deer_vla_tpu.train.losses import multi_exit_loss


def make(mode="post", use_hist=False, window=2, use_state=False):
    cfg = deer_tiny()
    cfg = dataclasses.replace(cfg, fusion_mode=mode, use_hist=use_hist,
                              window_size=window, use_state=use_state,
                              head=dataclasses.replace(
                                  cfg.head, window_size=window,
                                  use_state=use_state))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def vis(cfg, bw):
    r = np.random.RandomState(0)
    hw = cfg.vit.image_size
    return (jnp.asarray(r.randn(bw, 1, 1, 3, hw, hw), jnp.float32),
            jnp.asarray(r.randn(bw, 1, 1, 3, hw, hw), jnp.float32))


def test_encode_shapes_by_mode():
    n = deer_tiny().perceiver.num_latents
    d = deer_tiny().vis_dim
    for mode, want in (("post", 2 * n), ("pre", n), ("two_way", n)):
        cfg, params = make(mode)
        rgb, grip = vis(cfg, 4)
        media = encode_vision(params, rgb, grip, cfg)
        assert media.shape == (4, 1, want, d), (mode, media.shape)
        assert cfg.num_media_tokens == want

    # vit_concat folds the window (2) into the media tokens: batch B*W=4 in,
    # B=2 trajectories out with 2n*W tokens
    cfg, params = make("vit_concat", window=2)
    rgb, grip = vis(cfg, 4)
    media = encode_vision(params, rgb, grip, cfg, window_size=2)
    assert media.shape == (2, 1, 2 * n * 2, d)
    assert cfg.num_media_tokens == 2 * n * 2


def test_pre_differs_from_post():
    cfg_post, params = make("post")
    cfg_pre = dataclasses.replace(cfg_post, fusion_mode="pre")
    rgb, grip = vis(cfg_post, 2)
    m_post = encode_vision(params, rgb, grip, cfg_post)
    m_pre = encode_vision(params, rgb, grip, cfg_pre)
    assert m_post.shape[2] == 2 * m_pre.shape[2]
    # pre resamples the token UNION — not equal to either post half
    assert not np.allclose(np.asarray(m_post[:, :, :m_pre.shape[2]]),
                           np.asarray(m_pre), atol=1e-5)


def test_two_way_ignores_gripper():
    cfg, params = make("two_way")
    rgb, grip = vis(cfg, 2)
    m1 = encode_vision(params, rgb, grip, cfg)
    m2 = encode_vision(params, rgb, jnp.zeros_like(grip), cfg)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))


def test_use_hist_frame_embs():
    cfg, params = make("post", use_hist=True, window=2)
    assert params["frame_embs"].shape == (2, cfg.vis_dim)
    rgb, grip = vis(cfg, 4)
    m1 = encode_vision(params, rgb, grip, cfg, window_size=2)
    p2 = dict(params)
    p2["frame_embs"] = params["frame_embs"] + 1.0
    m2 = encode_vision(p2, rgb, grip, cfg, window_size=2)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    # frame_embs is trainable in the joint phase
    mask = trainable_mask(params, cfg, "joint")
    assert bool(mask["frame_embs"])
    assert not trainable_mask(params, cfg, "exit_only")["frame_embs"]


@pytest.mark.parametrize("mode,use_hist", [("pre", False), ("two_way", False),
                                           ("post", True)])
def test_forward_train_variants(mode, use_hist):
    """Per-frame-text variants run the full multi-exit forward + loss."""
    cfg, params = make(mode, use_hist=use_hist, window=2)
    bw = 2 * cfg.window_size
    rgb, grip = vis(cfg, bw)
    s = cfg.text_len
    ids = np.full((bw, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    out = forward_train(params, rgb, ids, np.ones((bw, s), np.int32), cfg,
                        jax.random.PRNGKey(1), vision_gripper=grip,
                        train=False)
    assert out.final_output.actions.shape == (2, cfg.window_size, 6)
    labels = jnp.asarray(np.random.RandomState(0).randn(2, cfg.window_size, 7),
                         jnp.float32)
    loss, metrics = multi_exit_loss(out, labels, last_step_only=use_hist)
    assert np.isfinite(float(loss))


def test_forward_train_vit_concat():
    """vit_concat: per-window text (batch B), one action per trajectory,
    last-step labels."""
    cfg, params = make("vit_concat", window=2)
    b, w = 2, cfg.window_size
    rgb, grip = vis(cfg, b * w)
    s = cfg.text_len
    ids = np.full((b, s), 7, np.int32)  # per-WINDOW text
    ids[:, 0] = cfg.media_token_id
    out = forward_train(params, rgb, ids, np.ones((b, s), np.int32), cfg,
                        jax.random.PRNGKey(1), vision_gripper=grip,
                        train=False)
    assert out.final_output.actions.shape == (b, 1, 6)
    labels = jnp.asarray(np.random.RandomState(0).randn(b, w, 7), jnp.float32)
    loss, _ = multi_exit_loss(out, labels, last_step_only=True)
    assert np.isfinite(float(loss))


def test_last_step_only_loss_slices():
    """last_step_only ignores all but the final window step."""
    cfg, params = make("post", window=2)
    bw = 2 * cfg.window_size
    rgb, grip = vis(cfg, bw)
    s = cfg.text_len
    ids = np.full((bw, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    out = forward_train(params, rgb, ids, np.ones((bw, s), np.int32), cfg,
                        jax.random.PRNGKey(1), vision_gripper=grip,
                        train=False)
    r = np.random.RandomState(0)
    labels = r.randn(2, cfg.window_size, 7).astype(np.float32)
    l1, _ = multi_exit_loss(out, jnp.asarray(labels), last_step_only=True)
    garbled = labels.copy()
    garbled[:, :-1] = 99.0  # perturb every step but the last
    l2, _ = multi_exit_loss(out, jnp.asarray(garbled), last_step_only=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

def test_vit_concat_without_gripper():
    """vit_concat must window-fold even with the gripper camera off
    (regression: the single-camera branch skipped the fold)."""
    n = deer_tiny().perceiver.num_latents
    cfg, params = make("vit_concat", window=2)
    cfg = dataclasses.replace(cfg, use_gripper=False)
    rgb, _ = vis(cfg, 4)
    media = encode_vision(params, rgb, None, cfg, window_size=2)
    assert media.shape[:3] == (2, 1, n * 2)
    assert cfg.num_media_tokens == n * 2


def test_serving_guard_for_window_folded_variants():
    """Engines without window-media support refuse vit_concat / use_hist
    loudly (the cond-chain engine); the while-loop engine AND the
    host-bucketed DeerPolicy serve both (round 2: DeerPolicy grew the
    window-folded encode so state/alt-head window-folded models have a
    bucketed path — see test_cli_window_folded.py)."""
    import pytest as _pytest
    from deer_vla_tpu.eval.fused_policy import FusedDeerPolicy
    from deer_vla_tpu.eval.policy import DeerPolicy
    cfg, params = make("vit_concat", window=2)
    with _pytest.raises(NotImplementedError):
        FusedDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    # DeerPolicy serves window-folded models: one step runs end to end
    pol = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1)
    hw, s, w = cfg.vit.image_size, cfg.text_len, cfg.window_size
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(w, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(w, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 7, np.int32)
    ids[0, 0] = cfg.media_token_id
    a = pol.step(img, grip, jnp.asarray(ids), jnp.ones((1, s), jnp.int32))
    assert a.shape == (7,) and np.all(np.isfinite(a))

def test_vit_concat_serving_rollout():
    """vit_concat serves through the while-loop engine + windowed adapter:
    rolling W-frame queue folded into the media tokens (the reference's
    img_queue protocol, eval_utils.py:344-386)."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, rollout)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, params = make("vit_concat", window=2)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    adapter = CalvinPolicyAdapter(pol, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    env.reset()
    oracle = DebugTaskOracle(threshold=0.05)
    success, exits, steps, _ = rollout(env, adapter, oracle, "open_drawer",
                                       "open the drawer", ep_len=6)
    assert steps >= 1 and len(exits) == steps
    assert all(e in cfg.all_exit_ids() for e in exits)

    # direct step: W frame rows in, one action out; carry stays per-stream
    obs = env.get_obs()
    a = adapter.step(obs, "open the drawer")
    assert a.shape == (7,)

def test_use_hist_serving_rollout():
    """use_hist serves through the while-loop engine: W frame rows +
    per-frame text; the head runs the full window and emits the last
    step's action (flamingo_mpt.py:700-740)."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, rollout)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, params = make("post", use_hist=True, window=2)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    adapter = CalvinPolicyAdapter(pol, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    env.reset()
    oracle = DebugTaskOracle(threshold=0.05)
    success, exits, steps, _ = rollout(env, adapter, oracle, "open_drawer",
                                       "open the drawer", ep_len=6)
    assert steps >= 1 and len(exits) == steps
    assert all(e in cfg.all_exit_ids() for e in exits)
    a = adapter.step(env.get_obs(), "open the drawer")
    assert a.shape == (7,)
    # (frame-embs sensitivity is asserted at the media level in
    # test_use_hist_frame_embs — at init the x-attn gates are zero
    # (helpers.py:236-279), so media cannot move the ACTION yet)

def test_window_folded_refusals():
    """Window-folded batched serving validates its inputs loudly:
    step_batch now SUPPORTS window-folded models (stream-major B*W frame
    rows) but rejects malformed row counts with a clear error instead of
    crashing in a reshape; mis-shaped proprio state is rejected the same
    way; use_hist+vit_concat combined serving is refused."""
    import pytest as _pytest
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = make("vit_concat", window=2)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    r = np.random.RandomState(0)
    hw = cfg.vit.image_size
    img = jnp.asarray(r.randn(2, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((2, cfg.text_len), 7, np.int32)
    # 2 text rows declare 2 streams; a 2-frame window then needs 4
    # stream-major image rows — 2 rows is a malformed batch
    with _pytest.raises(ValueError, match="streams\\*window"):
        pol.step_batch(img, img, jnp.asarray(ids),
                       jnp.ones((2, cfg.text_len), jnp.int32))
    # one state row for a 2-frame window: clear ValueError, not a reshape
    # blow-up inside the jitted program (round-1 deer_crash.jsonl family)
    with _pytest.raises(ValueError, match="state rows"):
        pol.step(img, img, jnp.asarray(ids[:1]),
                 jnp.ones((1, cfg.text_len), jnp.int32),
                 state=jnp.zeros((1, 1, 1, 15)))
    cfg_both = dataclasses.replace(cfg, use_hist=True)
    with _pytest.raises(NotImplementedError):
        ScanDeerPolicy(params, cfg_both, thresholds=[0.05, 1e8])


def test_vit_concat_state_serving():
    """vit_concat + use_state serves through the while-loop engine with
    per-frame state rows (the adapter's state_queue protocol); the head
    consumes the LAST frame's row like training does."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = make("vit_concat", window=2, use_state=True)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    r = np.random.RandomState(0)
    hw = cfg.vit.image_size
    img = jnp.asarray(r.randn(2, 1, 1, 3, hw, hw), jnp.float32)
    ids, mask = tok(["do the thing"])
    state = jnp.asarray(r.randn(2, 1, 1, 15).astype(np.float32))
    a = pol.step(img, img, jnp.asarray(ids), jnp.asarray(mask), state=state)
    assert a.shape == (7,) and np.isfinite(a).all()
    # state changes the action (the row actually reaches the program)
    pol.reset()
    b = pol.step(img, img, jnp.asarray(ids), jnp.asarray(mask),
                 state=10.0 + state)
    assert not np.allclose(a, b)

def test_pre_mode_serving_rollout():
    """pre fusion (single perceiver over the token union) serves through the
    standard engines — per-frame media, no window bookkeeping."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, rollout)
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, params = make("pre", window=2)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    adapter = CalvinPolicyAdapter(pol, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    env.reset()
    oracle = DebugTaskOracle(threshold=0.05)
    success, exits, steps, _ = rollout(env, adapter, oracle, "open_drawer",
                                       "open the drawer", ep_len=4)
    assert steps >= 1 and all(e in cfg.all_exit_ids() for e in exits)
