"""Batched diffusion-head serving (--lanes + head_type='diffusion'):
eval/diffusion_policy.BatchedDiffusionSampler must reproduce the sequential
DiffusionSamplerPolicy per lane (same features + same per-lane history/rng
discipline -> same plans), and compose with the lockstep harness.

Reference: the diffusion sampling branch eval_utils.py:388-419 (the
reference has no batched rollout at all — one env per GPU rank)."""

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
from deer_vla_tpu.eval.diffusion_policy import (BatchedDiffusionSampler,
                                                DiffusionSamplerPolicy)
from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                       DebugTaskOracle, evaluate_policy,
                                       make_debug_sequences)
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer


def _cfg(**kw):
    cfg = deer_tiny()
    extra = dict(head_type="diffusion", diff_timesteps=5, diff_horizon=4,
                 n_obs_steps=2, diff_down_dims=(8, 16))
    extra.update(kw)
    cfg = dataclasses.replace(cfg, **extra)
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    return dataclasses.replace(cfg, media_token_id=tok.media_token_id), tok


def _obs(cfg, seed):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = r.randn(1, 1, 1, 3, hw, hw).astype(np.float32)
    grip = r.randn(1, 1, 1, 3, hw, hw).astype(np.float32)
    ids = np.full((1, s), 3 + seed % 5, np.int32)
    ids[0, 0] = cfg.media_token_id
    return img, grip, ids, np.ones((1, s), np.int32)


def test_batched_diffusion_lanes_match_sequential_per_lane():
    """Two lanes with DIFFERENT observation streams: each lane's plans must
    equal a fresh sequential DiffusionSamplerPolicy fed only that lane's
    stream (per-lane rng counters + histories are lane-local)."""
    cfg, _ = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [-1.0, 1e8]  # always run to the last exit

    batched = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)
    seq = [DiffusionSamplerPolicy(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)
        for _ in range(2)]

    for step in range(3):
        obs = [_obs(cfg, seed=10 * lane + step) for lane in range(2)]
        img = jnp.asarray(np.concatenate([o[0] for o in obs]))
        grip = jnp.asarray(np.concatenate([o[1] for o in obs]))
        ids = jnp.asarray(np.concatenate([o[2] for o in obs]))
        mask = jnp.asarray(np.concatenate([o[3] for o in obs]))
        plans, exits = batched.step_batch(img, grip, ids, mask)
        assert plans.shape[0] == 2 and plans.shape[2] == 7
        for lane in range(2):
            ref = seq[lane].step(*[jnp.asarray(x) for x in obs[lane]])
            np.testing.assert_allclose(plans[lane], ref, rtol=2e-4,
                                       atol=2e-4,
                                       err_msg=f"lane {lane} step {step}")
            assert set(np.unique(plans[lane][:, -1])) <= {-1.0, 1.0}
        assert exits.shape == (2,)


def test_batched_diffusion_reset_streams_is_lane_local():
    """Resetting one lane zeroes only that lane's history (and its engine
    carry); the other lane's plans keep evolving as if nothing happened."""
    cfg, _ = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [-1.0, 1e8]
    batched = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)
    ref = DiffusionSamplerPolicy(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)

    def batch_of(step):
        obs = [_obs(cfg, seed=10 * lane + step) for lane in range(2)]
        return tuple(jnp.asarray(np.concatenate([o[i] for o in obs]))
                     for i in range(4)), obs

    (img, grip, ids, mask), obs = batch_of(0)
    plans, _ = batched.step_batch(img, grip, ids, mask)
    ref.step(*[jnp.asarray(x) for x in obs[1]])  # lane-1 mirror

    batched.reset_streams(np.array([True, False]))  # lane 0 resets

    (img, grip, ids, mask), obs = batch_of(1)
    plans, _ = batched.step_batch(img, grip, ids, mask)
    ref_plan = ref.step(*[jnp.asarray(x) for x in obs[1]])
    np.testing.assert_allclose(plans[1], ref_plan, rtol=2e-4, atol=2e-4)
    # lane-0 history really was zeroed
    np.testing.assert_array_equal(
        batched._hist[0, : max(0, batched.hist_len - plans.shape[1])], 0)


def test_batched_diffusion_rollout_single_lane_matches_sequential():
    """The harness-level check: 1 batched lane over DebugEnv chains must
    reproduce the sequential rollout exactly (same counters/histories)."""
    cfg, tok = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [-1.0, 1e8]
    seqs = make_debug_sequences(3)
    oracle = DebugTaskOracle(threshold=0.05)

    pol_seq = DiffusionSamplerPolicy(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)
    adapter = CalvinPolicyAdapter(pol_seq, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    ref = evaluate_policy(adapter, env, seqs, {}, oracle, ep_len=12)

    bpol = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), params, seed=0)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)]
    out = evaluate_policy_batched(bpol, envs, seqs, {}, oracle, tok,
                                  text_len=cfg.text_len, ep_len=12)
    assert out["avg_seq_len"] == ref["avg_seq_len"]
    assert out["task_info"] == ref["task_info"]
    np.testing.assert_allclose(out["success_exit_hist"],
                               ref["success_exit_hist"], atol=1e-9)


def test_batched_diffusion_rollout_two_lanes_and_copy():
    """2 lanes + pipeline=2 exercises the per-group copy.copy split: the
    wrapper must give each group an independent inner carry + host state
    and still drain all chains to a well-formed report."""
    cfg, tok = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    bpol = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8]), params, seed=0)
    g2 = copy.copy(bpol)
    assert g2.policy is not bpol.policy  # independent engine carries
    seqs = make_debug_sequences(4)
    oracle = DebugTaskOracle(threshold=0.05)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2)]
    out = evaluate_policy_batched(bpol, envs, seqs, {}, oracle, tok,
                                  text_len=cfg.text_len, ep_len=10,
                                  pipeline=2)
    assert len(out["task_info"]) > 0
    assert 0.0 <= out["avg_seq_len"] <= 5.0
    total = sum(out["success_exit_hist"]) + sum(out["fail_exit_hist"])
    assert total > 0  # exits were recorded through the wrapper


# ---- HTTP micro-batcher (deer-serve --batch_lanes) with diffusion heads ----

import base64


def _http_payload(cfg, stream, seed, instruction="push the red block"):
    r = np.random.RandomState(seed)
    rgb = r.randint(0, 255, (48, 48, 3), np.uint8)
    grip = r.randint(0, 255, (48, 48, 3), np.uint8)
    return {"stream": stream, "instruction": instruction,
            "rgb": base64.b64encode(rgb.tobytes()).decode(),
            "rgb_shape": list(rgb.shape),
            "gripper": base64.b64encode(grip.tobytes()).decode(),
            "gripper_shape": list(grip.shape)}


def _diff_batcher(cfg, params, tok, lanes=4):
    from deer_vla_tpu.serving.batcher import BatchedActionServer
    pol = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8]), params, seed=0)
    return BatchedActionServer(pol, tok, lanes=lanes, window_ms=30.0)


def test_batcher_diffusion_plans_and_parked_isolation():
    """deer-serve --batch_lanes with a diffusion head: clients receive
    (k, 7) plans, and a stream sitting out a window (parked lane) keeps its
    plan history / rng counter / carry untouched — its trajectory equals a
    solo-server run."""
    cfg, tok = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    k = cfg.diff_horizon - (cfg.n_obs_steps - 1)

    core = _diff_batcher(cfg, params, tok)
    try:
        a1 = core.step(_http_payload(cfg, "a", 10))
        _ = core.step(_http_payload(cfg, "b", 11))  # a parked here
        _ = core.step(_http_payload(cfg, "b", 12))  # a parked here
        a2 = core.step(_http_payload(cfg, "a", 13))
        assert core.healthz()["head_type"] == "diffusion"
    finally:
        core.shutdown()
    plan1 = np.asarray(a1["action"], np.float32)
    assert plan1.shape == (k, 7)
    assert set(np.unique(plan1[:, -1])) <= {-1.0, 1.0}

    solo = _diff_batcher(cfg, params, tok)
    try:
        s1 = solo.step(_http_payload(cfg, "a", 10))
        s2 = solo.step(_http_payload(cfg, "a", 13))
    finally:
        solo.shutdown()
    np.testing.assert_allclose(a1["action"], s1["action"], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(a2["action"], s2["action"], rtol=2e-4,
                               atol=2e-4)


def test_batcher_still_refuses_fc_gpt_heads():
    from deer_vla_tpu.serving.batcher import BatchedActionServer
    from deer_vla_tpu.serving.server import ServeError
    import pytest
    cfg, tok = _cfg()
    cfg = dataclasses.replace(cfg, head_type="gpt",
                              fusion_mode=cfg.fusion_mode)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8])
    with pytest.raises(ServeError, match="per-stream core"):
        BatchedActionServer(pol, tok)


def test_batched_diffusion_candidates_mode():
    """Parallel-BO substrate: K candidate threshold rows over diffusion
    lanes return K isolated reports (cli/bayes_opt.py --parallel with a
    diffusion-head checkpoint)."""
    cfg, tok = _cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    bpol = BatchedDiffusionSampler(
        ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8]), params, seed=0)
    seqs = make_debug_sequences(2)
    oracle = DebugTaskOracle(threshold=0.05)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2)]
    cands = [[-1.0, 1e5], [1e30, 1e5]]  # never-exit-early vs always-first
    reports = evaluate_policy_batched(bpol, envs, seqs, {}, oracle, tok,
                                      text_len=cfg.text_len, ep_len=8,
                                      candidates=cands)
    assert len(reports) == 2
    # candidate 1 (threshold +inf at the first exit) must exit at layer 1;
    # candidate 0 (threshold -1) must always run to the last exit
    assert reports[1]["avg_exit_layer"] < reports[0]["avg_exit_layer"]
