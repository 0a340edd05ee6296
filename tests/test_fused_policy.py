"""Fused single-program dynamic exit: parity with the bucketed host policy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.fused_policy import FusedDeerPolicy
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
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, grip, jnp.asarray(ids), jnp.ones((1, s), jnp.int32)


@pytest.mark.parametrize("th", [
    [1e8, 1e8],      # always exit at first bucket
    [-1.0, 1e8],     # never exit early -> last bucket
    [0.05, 1e8],     # data-dependent
])
def test_fused_matches_bucketed(setup, th):
    cfg, params = setup
    exits = list(cfg.all_exit_ids())

    fused = FusedDeerPolicy(params, cfg, thresholds=th)
    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    bucketed = DeerPolicy(params, cfg, controller=ctrl)

    for t in range(4):
        img, grip, ids, mask = obs(cfg, seed=t)
        bucketed.set_timestep(t)
        a_b = bucketed.step(img, grip, ids, mask)
        a_f = fused.step(img, grip, ids, mask)
        assert fused.last_exit_layer == bucketed.last_exit_layer, \
            f"step {t}: fused exit {fused.last_exit_layer} vs {bucketed.last_exit_layer}"
        np.testing.assert_allclose(a_f, a_b, rtol=2e-4, atol=2e-4)


def test_threshold_change_no_recompile(setup):
    """Thresholds are a runtime arg: flipping them must change behavior on
    the same compiled program."""
    cfg, params = setup
    fused = FusedDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    img, grip, ids, mask = obs(cfg)
    fused.step(img, grip, ids, mask)
    assert fused.last_exit_layer == cfg.all_exit_ids()[0]
    fused.reset()
    fused.set_thresholds([-1.0, 1e8])
    fused.step(img, grip, ids, mask)
    assert fused.last_exit_layer == cfg.all_exit_ids()[-1]

def test_fused_policy_stage_reuse(setup):
    """steps_per_stage reuse through the runtime per-segment threshold array
    (value_net.py:284-286) — same protocol as the while-loop engine."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.models.flamingo import init_deer

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = FusedDeerPolicy(params, cfg, thresholds=[-1.0, 1e8],
                          steps_per_stage=2)
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
    pol.set_thresholds([1e8, 1e8])  # would exit earlier if re-evaluated
    pol.set_timestep(1)
    pol.step(img, img, ids, mask)
    assert pol.last_exit_layer == first  # mid-stage: reuse
    pol.set_timestep(2)
    pol.step(img, img, ids, mask)
    assert pol.last_exit_layer == cfg.all_exit_ids()[0]  # new stage
