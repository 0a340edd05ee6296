"""Tests for the dynamic-exit control plane: delta math, threshold solver,
calibration, and the bucketed dynamic-exit policy on DebugEnv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.models.value_net import (ExitController, exit_probs,
                                           get_delta, solve_thresholds)


def test_get_delta_types():
    a = jnp.asarray([[1.0, 2.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0, 0.0]])
    assert np.isclose(get_delta(a, b, "mean")[0], 5.0 / 3)
    assert np.isclose(get_delta(a, b, "L2")[0], np.sqrt(9.0 / 3))
    assert np.isclose(get_delta(a, b, "max")[0], 2.0)
    assert abs(get_delta(a, a, "cosine")[0]) < 1e-6


def test_exit_probs():
    p = exit_probs(6, 0.8, "exp")
    assert np.isclose(p.sum(), 1.0)
    assert np.all(np.diff(p) < 0)  # decreasing: earlier exits more likely
    p9 = exit_probs(6, 0.8, "exp", model_name="mpt_9b")
    assert p9[0] == 0.0  # value_net.py:235-236


def test_solve_thresholds_matches_distribution():
    """With leq + exp dist, the solved thresholds should reproduce the target
    exit fractions on the calibration set itself."""
    rng = np.random.RandomState(0)
    n_exit, n = 4, 4000
    vals = rng.rand(n_exit, n).astype(np.float64)
    exit_ids = [1, 3, 5, 7]
    th, probs = solve_thresholds(vals, 1.0, exit_ids, max_layer=7)
    assert set(th.keys()) == set(exit_ids)
    assert th[7] == 1e8  # last exit catches everything
    # simulate exits
    taken = np.full(n, -1)
    for k, e in enumerate(exit_ids):
        m = (taken == -1) & (vals[k] <= th[e])
        taken[m] = k
    counts = np.bincount(taken[taken >= 0], minlength=n_exit) / n
    # uniform target (exit_ratio=1.0) -> each ~0.25
    assert np.all(np.abs(counts[:-1] - probs[:-1]) < 0.02)


def _reference_solver(pred, exit_ratio, exit_ids, max_layer, exit_dist,
                      leq, model_name):
    """Torch mirror of the reference's greedy quantile selection
    (value_net.py:206-272), written from its algorithm: sort each exit's
    deltas, walk until floor(n*probs[k]) NOT-yet-filtered samples are
    passed, take that delta as the threshold, mark samples the threshold
    would exit.  Used only to pin element-wise parity of solve_thresholds."""
    import math as _math

    import scipy.stats
    import torch
    pred = torch.asarray(np.asarray(pred))
    n_stage, n_sample = pred.shape
    real_ids = [x for x in exit_ids if x <= max_layer]
    n = len(real_ids)
    _, sorted_idx = pred.sort(dim=1, descending=not leq)
    filtered = torch.zeros(n_sample)
    T = torch.full((n,), -1e8 if leq else 1e8)
    if exit_dist == "exp":
        probs = exit_ratio ** torch.arange(1, n + 1)
    elif exit_dist == "gauss":
        probs = torch.tensor([_math.exp(-(i - exit_ratio) ** 2 / 2.0)
                              for i in range(n)])
    else:  # gamma
        probs = torch.tensor([scipy.stats.gamma.pdf(v, exit_ratio, scale=2.0)
                              for v in np.arange(1, n + 1, dtype=np.float32)])
    if "mpt_9b" in model_name:
        probs[0] = 0
    probs = probs / probs.sum()
    for k in range(n - 1):
        count, out_n = 0, _math.floor(n_sample * probs[k])
        for i in range(n_sample):
            ori = sorted_idx[k][i]
            if filtered[ori] == 0:
                count += 1
                if count == out_n:
                    T[k] = pred[k][ori]
                    break
        filtered += ((pred[k] <= T[k]) if leq else
                     (pred[k] >= T[k])).to(filtered.dtype)
    T[n - 1] = 1e8 if leq else -1e8
    return {int(real_ids[i]): float(T[i]) for i in range(n)}


@pytest.mark.parametrize("dist", ["exp", "gauss", "gamma"])
@pytest.mark.parametrize("leq", [True, False])
@pytest.mark.parametrize("model", ["mpt_dolly_3b", "mpt_9b"])
def test_solver_elementwise_parity_with_reference_algorithm(dist, leq, model):
    rng = np.random.RandomState(7)
    exit_ids = [1, 3, 5, 7]
    # float32: calibration deltas are model outputs (the reference's T and
    # pred tensors are float32; float64 inputs would diverge on the cast of
    # the threshold-defining sample)
    vals = rng.rand(4, 1200).astype(np.float32)
    ratio = {"exp": 0.8, "gauss": 1.5, "gamma": 1.0}[dist]
    ours, _ = solve_thresholds(vals, ratio, exit_ids, max_layer=7,
                               exit_dist=dist, leq=leq, model_name=model)
    ref = _reference_solver(vals, ratio, exit_ids, 7, dist, leq, model)
    assert set(ours) == set(ref)
    for e in ours:
        assert abs(ours[e] - ref[e]) < 1e-6, (e, ours[e], ref[e])


def test_exit_controller_protocol():
    ctrl = ExitController(exit_id_list=[1, 3], steps_per_stage=1, max_layer=4)
    ctrl.set_thresholds({1: 0.1, 3: 1e8})
    ctrl.reset_episode()
    ctrl.set_timestep(0)
    assert not ctrl.should_exit(0, 0.0)          # not an exit layer
    assert not ctrl.should_exit(1, 0.5)          # above threshold
    assert ctrl.should_exit(3, 99.0)             # last exit always fires
    assert ctrl.cur_exit_id == 3
    assert ctrl.should_exit(1, 0.05)             # below threshold


def test_exit_controller_stage_reuse():
    ctrl = ExitController(exit_id_list=[1, 3], steps_per_stage=2, max_layer=4)
    ctrl.set_thresholds({1: 0.1, 3: 1e8})
    ctrl.reset_episode()
    ctrl.set_timestep(0)
    assert not ctrl.reuse_stage_exit()
    ctrl.cur_exit_id = 1
    ctrl.set_timestep(1)
    assert ctrl.reuse_stage_exit()   # mid-stage: reuse exit 1
    ctrl.set_timestep(2)
    assert not ctrl.reuse_stage_exit()


@pytest.fixture(scope="module")
def tiny():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_calibration_and_dynamic_rollout(tiny):
    """End-to-end: calibrate thresholds on synthetic batches, then run a
    dynamic-exit rollout on DebugEnv and check the exit machinery."""
    cfg, params = tiny
    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.calibrate import calibrate
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                           DebugTaskOracle, evaluate_policy,
                                           make_debug_sequences)

    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    # make the hash tokenizer agree with the config's special ids
    assert tok.media_token_id == cfg.mpt.vocab_size - 2
    import dataclasses
    cfg2 = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                               eoc_token_id=tok.eoc_token_id)

    batches = DebugBatcher(cfg2, tok, batch_size=2, num_batches=2,
                           img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    thresholds, values = calibrate(params, cfg2, batches, exit_ratio=1.0)
    assert values.shape[0] == cfg2.num_exits
    assert set(thresholds.keys()) == set(cfg2.all_exit_ids())
    assert np.isfinite(values).all()

    ctrl = ExitController(exit_id_list=list(cfg2.all_exit_ids()),
                          steps_per_stage=1, max_layer=cfg2.n_layers)
    ctrl.set_thresholds(thresholds)
    policy = DeerPolicy(params, cfg2, controller=ctrl)
    adapter = CalvinPolicyAdapter(policy, tok, text_len=cfg2.text_len)

    env = DebugEnv(img_hw=cfg2.vit.image_size, grip_hw=cfg2.vit.image_size)
    oracle = DebugTaskOracle(threshold=0.05)
    seqs = make_debug_sequences(2)
    report = evaluate_policy(adapter, env, seqs, {}, oracle, ep_len=20)
    assert 0.0 <= report["avg_seq_len"] <= 5.0
    assert abs(sum(report["success_exit_hist"]) + sum(report["fail_exit_hist"])
               - (2.0 if report["avg_seq_len"] > 0 else 1.0)) < 2.1
    # exits must be members of the exit list
    assert policy.last_exit_layer in cfg2.all_exit_ids()


def test_fixed_exit_policy(tiny):
    cfg, params = tiny
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter, DebugEnv

    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    policy = DeerPolicy(params, cfg2, exit_id=1)
    adapter = CalvinPolicyAdapter(policy, tok, text_len=cfg2.text_len)
    env = DebugEnv(img_hw=cfg2.vit.image_size, grip_hw=cfg2.vit.image_size)
    a1 = adapter.step(env.get_obs(), "pick up the red block")
    assert a1.shape == (7,)
    assert a1[6] in (-1.0, 1.0)
    assert policy.last_exit_layer == 1


def test_calib_warm_prefix_vit_concat():
    """--calib_warm on a window-folded model: the warm-carry deltas differ
    from the zero-carry ones (the skew it corrects is real), are
    deterministic per rng, and feed the solver normally."""
    import dataclasses

    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.calibrate import generate_calibration_values

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, fusion_mode="vit_concat",
                              media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)

    def batches():
        return DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                            img_hw=cfg.vit.image_size,
                            grip_hw=cfg.vit.image_size)

    v0 = generate_calibration_values(params, cfg, batches(),
                                     rng=jax.random.PRNGKey(5))
    vw = generate_calibration_values(params, cfg, batches(),
                                     rng=jax.random.PRNGKey(5),
                                     warm_prefix=3)
    vw2 = generate_calibration_values(params, cfg, batches(),
                                      rng=jax.random.PRNGKey(5),
                                      warm_prefix=3)
    assert v0.shape == vw.shape and np.isfinite(vw).all()
    assert not np.allclose(v0, vw)          # the carry state matters
    np.testing.assert_array_equal(vw, vw2)  # deterministic per rng
    th, _ = solve_thresholds(vw, 1.0, list(cfg.all_exit_ids()),
                             cfg.n_layers - 1)
    assert len(th) == len(list(cfg.all_exit_ids()))
