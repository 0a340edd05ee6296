"""Batched streaming policy: parity with single-stream, per-stream exits."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.batched_policy import BatchedDeerPolicy
from deer_vla_tpu.eval.policy import DeerPolicy
from deer_vla_tpu.models.flamingo import init_deer


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_obs(cfg, b, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((b, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, grip, jnp.asarray(ids), jnp.ones((b, s), jnp.int32)


def test_batched_matches_single_at_full_depth(setup):
    cfg, params = setup
    b = 3
    # thresholds force everyone to the last exit
    th = [-1.0] * (cfg.num_exits - 1) + [1e8]
    bp = BatchedDeerPolicy(params, cfg, batch=b, thresholds=th)
    sp = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1)

    img, grip, ids, mask = make_obs(cfg, b)
    for t in range(3):
        acts, exits = bp.step(img, grip, ids, mask)
        assert np.all(exits == cfg.n_layers - 1)
    # single-stream reference on stream 0
    sp.reset()
    for t in range(3):
        a_single = sp.step(img[:1], grip[:1], ids[:1], mask[:1])
    np.testing.assert_allclose(acts[0], a_single, rtol=2e-4, atol=2e-4)


def test_batched_early_exit_and_masked_commit(setup):
    cfg, params = setup
    b = 4
    # huge first threshold: everyone exits at the first bucket
    th = [1e8] * cfg.num_exits
    bp = BatchedDeerPolicy(params, cfg, batch=b, thresholds=th)
    img, grip, ids, mask = make_obs(cfg, b, seed=1)
    acts, exits = bp.step(img, grip, ids, mask)
    assert np.all(exits == cfg.all_exit_ids()[0])
    assert acts.shape == (b, 7)
    assert set(np.unique(acts[:, 6])) <= {-1.0, 1.0}

    # per-stream reset keeps other streams' carries
    c_before = np.asarray(bp.carry[0])
    bp.reset(stream_mask=np.array([True, False, False, False]))
    c_after = np.asarray(bp.carry[0])
    assert np.all(c_after[:, 0] == 0)
    np.testing.assert_array_equal(c_after[:, 1:], c_before[:, 1:])


def test_batched_steps_per_stage_reuse(setup):
    """steps_per_stage=2: the fresh-step decision is held on the next step
    per stream, ignoring thresholds; runtime set_thresholds needs no
    rebuild; per-stream resets desynchronize the stage clocks
    (value_net.py stage-reuse parity for the batched engine)."""
    cfg, params = setup
    b = 2
    last = cfg.n_layers - 1
    first = cfg.all_exit_ids()[0]
    # t=0 fresh: impossible thresholds -> everyone runs to the final exit
    bp = BatchedDeerPolicy(params, cfg, batch=b,
                           thresholds=[-1.0] * (cfg.num_exits - 1) + [1e8],
                           steps_per_stage=2)
    img, grip, ids, mask = make_obs(cfg, b, seed=2)
    _, e0 = bp.step(img, grip, ids, mask)
    assert np.all(e0 == last)
    # t=1 reuse: even with exit-everywhere thresholds the stage holds
    bp.set_thresholds([1e8] * cfg.num_exits)
    _, e1 = bp.step(img, grip, ids, mask)
    assert np.all(e1 == last), "stage must be reused on odd steps"
    # t=2 fresh again: the new thresholds take effect -> first exit
    _, e2 = bp.step(img, grip, ids, mask)
    assert np.all(e2 == first)
    # t=3 reuse of the new stage, even with never-exit thresholds
    bp.set_thresholds([-1.0] * (cfg.num_exits - 1) + [1e8])
    _, e3 = bp.step(img, grip, ids, mask)
    assert np.all(e3 == first)

    # per-stream stage clocks: reset stream 0 right after a fresh step so
    # the two streams land on different phases
    bp.reset()
    bp.set_thresholds([-1.0] * (cfg.num_exits - 1) + [1e8])
    bp.step(img, grip, ids, mask)                       # both fresh -> last
    bp.reset(stream_mask=np.array([True, False]))       # s0 clock -> 0
    bp.set_thresholds([1e8] * cfg.num_exits)
    _, e5 = bp.step(img, grip, ids, mask)
    assert e5[0] == first, "reset stream decides fresh with new thresholds"
    assert e5[1] == last, "unreset stream still holds its recorded stage"
