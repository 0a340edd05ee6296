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
