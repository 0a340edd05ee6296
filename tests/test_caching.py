"""Training-free acceleration modes: action caching + visual-token caching
(eval/caching.py, PAPERS.md action-caching / token-caching techniques)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.caching import (ActionCachePolicy, frame_delta,
                                       VisionCacheDeerPolicy)
from deer_vla_tpu.eval.policy import DeerPolicy
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.models.value_net import ExitController


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def obs(cfg, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, jnp.asarray(ids), jnp.ones((1, s), jnp.int32)


def _ctrl_policy(cfg, params, th=(0.05, 1e8)):
    exits = list(cfg.all_exit_ids())
    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    return DeerPolicy(params, cfg, controller=ctrl)


def test_frame_delta():
    a = jnp.zeros((1, 1, 1, 3, 28, 28))
    assert float(frame_delta(a, a)) == 0.0
    assert float(frame_delta(a, a + 1.0)) > 0.5


def test_action_cache_hits_and_refresh(setup):
    cfg, params = setup
    pol = ActionCachePolicy(_ctrl_policy(cfg, params), tau=0.01,
                            refresh_every=3)
    img, ids, mask = obs(cfg)
    a0 = pol.step(img, img, ids, mask)
    a1 = pol.step(img, img, ids, mask)  # identical frame -> hit
    a2 = pol.step(img, img, ids, mask)  # hit
    a3 = pol.step(img, img, ids, mask)  # refresh boundary -> miss
    assert pol.hits == 2 and pol.steps == 4
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(a0, a2)
    assert np.isfinite(a3).all()
    # a changed frame misses
    img2, _, _ = obs(cfg, seed=9)
    pol.step(img2, img2, ids, mask)
    assert pol.hits == 2
    # hits report exit layer -1 (zero LLM cost)
    pol.step(img2, img2, ids, mask)
    assert pol.hits == 3 and pol.last_exit_layer == -1


def test_vision_cache_exact_on_miss_and_static_frames(setup):
    """With tau=-1 (never hit) the wrapper is bitwise-identical to the inner
    policy; with static frames, cached latents give the same actions as
    re-encoding (same input -> same latents)."""
    cfg, params = setup
    img, ids, mask = obs(cfg)

    plain = _ctrl_policy(cfg, params)
    wrapped = VisionCacheDeerPolicy(_ctrl_policy(cfg, params), tau=-1.0)
    for t in range(3):
        plain.set_timestep(t)
        wrapped.set_timestep(t)
        a_p = plain.step(img, img, ids, mask)
        a_w = wrapped.step(img, img, ids, mask)
        np.testing.assert_allclose(a_w, a_p, rtol=1e-6, atol=1e-6)
        assert wrapped.last_exit_layer == plain.last_exit_layer
    assert wrapped.encode_hits == 0

    cached = VisionCacheDeerPolicy(_ctrl_policy(cfg, params), tau=0.01)
    for t in range(3):
        cached.set_timestep(t)
        a_c = cached.step(img, img, ids, mask)
    assert cached.encode_hits == 2  # encode ran once
    # carry advanced on every step (exact head semantics) -> same traj as
    # the uncached policy on identical frames
    np.testing.assert_allclose(a_c, a_p, rtol=1e-5, atol=1e-5)


def test_vision_cache_multi_step_plan(setup):
    cfg, params = setup
    cfg2 = dataclasses.replace(
        cfg, head=dataclasses.replace(cfg.head, multi_step_action=2))
    params2 = init_deer(jax.random.PRNGKey(0), cfg2)
    pol = VisionCacheDeerPolicy(_ctrl_policy(cfg2, params2), tau=0.01)
    img, ids, mask = obs(cfg2)
    plan = pol.step(img, img, ids, mask)
    assert plan.shape == (2, 7)
    plan2 = pol.step(img, img, ids, mask)
    assert pol.encode_hits == 1 and np.isfinite(plan2).all()


def test_vision_cache_scan_engine(setup):
    """VisionCacheScanPolicy: the while-loop engine's split encode/decode —
    never-hit wrapper is identical to the plain scan policy; static frames
    hit the cache while carry/exit stay exact."""
    from deer_vla_tpu.eval.caching import VisionCacheScanPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg, params = setup
    img, ids, mask = obs(cfg)
    th = [0.05, 1e8]

    plain = ScanDeerPolicy(params, cfg, thresholds=th)
    wrapped = VisionCacheScanPolicy(ScanDeerPolicy(params, cfg,
                                                   thresholds=th), tau=-1.0)
    for t in range(3):
        plain.set_timestep(t)
        wrapped.set_timestep(t)
        a_p = plain.step(img, img, ids, mask)
        a_w = wrapped.step(img, img, ids, mask)
        np.testing.assert_allclose(a_w, a_p, rtol=1e-6, atol=1e-6)
        assert wrapped.last_exit_layer == plain.last_exit_layer
    assert wrapped.encode_hits == 0

    cached = VisionCacheScanPolicy(ScanDeerPolicy(params, cfg,
                                                  thresholds=th), tau=0.01)
    for t in range(3):
        cached.set_timestep(t)
        a_c = cached.step(img, img, ids, mask)
    assert cached.encode_hits == 2  # encode ran once
    np.testing.assert_allclose(a_c, a_p, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# rolling per-frame token cache for window-folded serving (FrameCachePolicy)
# ---------------------------------------------------------------------------


def _window_folded(mode="vit_concat", use_hist=False, use_state=False,
                   window=3):
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(
        cfg, fusion_mode=mode, use_hist=use_hist, use_state=use_state,
        window_size=window, media_token_id=tok.media_token_id,
        head=dataclasses.replace(cfg.head, window_size=window,
                                 use_state=use_state))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params, tok


@pytest.mark.parametrize("mode,use_hist,use_state", [
    ("vit_concat", False, False),
    ("post", True, False),
    ("vit_concat", False, True),
], ids=["vit_concat", "use_hist", "vit_concat_state"])
def test_frame_cache_equivalence(mode, use_hist, use_state):
    """FrameCachePolicy (encode newest frame only, cached token window)
    produces the same actions as the full re-encode protocol on a fixed
    trajectory (VERDICT r2 item 7 'bit-equivalent' gate)."""
    from collections import deque

    from deer_vla_tpu.eval.caching import FrameCachePolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, params, tok = _window_folded(mode, use_hist, use_state)
    W = cfg.window_size
    th = [0.05, 1e8]
    base = ScanDeerPolicy(params, cfg, thresholds=list(th))
    cached = FrameCachePolicy(ScanDeerPolicy(params, cfg,
                                             thresholds=list(th)))

    hw, s = cfg.vit.image_size, cfg.text_len
    ids, mask = tok(["push the red block"])
    if use_hist:
        ids = np.tile(ids, (W, 1))
        mask = np.tile(mask, (W, 1))
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    r = np.random.RandomState(3)
    img_q, grip_q, st_q = (deque(maxlen=W), deque(maxlen=W), deque(maxlen=W))
    for step in range(5):
        img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
        grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
        st = jnp.asarray(r.randn(1, 1, 1, 15).astype(np.float32))
        if not img_q:
            for _ in range(W):
                img_q.append(img), grip_q.append(grip), st_q.append(st)
        else:
            img_q.append(img), grip_q.append(grip), st_q.append(st)
        img_w = jnp.concatenate(list(img_q), 0)
        grip_w = jnp.concatenate(list(grip_q), 0)
        st_w = jnp.concatenate(list(st_q), 0) if use_state else None

        base.set_timestep(step)
        cached.set_timestep(step)
        if use_state:
            a_full = base.step(img_w, grip_w, ids, mask, state=st_w)
            a_cache = cached.step(img, grip, ids, mask, state=st_w)
        else:
            a_full = base.step(img_w, grip_w, ids, mask)
            a_cache = cached.step(img, grip, ids, mask)
        np.testing.assert_allclose(a_cache, a_full, rtol=1e-5, atol=1e-5,
                                   err_msg=f"step {step}")
        assert cached.last_exit_layer == base.last_exit_layer, step


def test_frame_cache_through_adapter():
    """The adapter detects feeds_single_frame: no host image window, same
    actions as the windowed re-encode protocol end to end."""
    from deer_vla_tpu.eval.caching import FrameCachePolicy
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter, DebugEnv
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy

    cfg, params, tok = _window_folded("vit_concat", window=2)
    th = [0.05, 1e8]
    ad_full = CalvinPolicyAdapter(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), tok,
        text_len=cfg.text_len)
    ad_cache = CalvinPolicyAdapter(
        FrameCachePolicy(ScanDeerPolicy(params, cfg, thresholds=list(th))),
        tok, text_len=cfg.text_len)
    assert ad_cache._img_window == 0 and ad_full._img_window == 2

    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size,
                   dynamic=True)
    o = env.reset()
    ad_full.reset()
    ad_cache.reset()
    for step in range(4):
        a1 = ad_full.step(o, "lift the blue block")
        a2 = ad_cache.step(o, "lift the blue block")
        np.testing.assert_allclose(a2, a1, rtol=1e-5, atol=1e-5,
                                   err_msg=f"step {step}")
        o, *_ = env.step(a1)
