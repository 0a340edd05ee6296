"""Batched rollout harness: lockstep streams must reproduce the sequential
harness results on DebugEnv (same policy math per stream, same oracle)."""

import dataclasses

import jax
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
from deer_vla_tpu.eval.policy import DeerPolicy
from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                       DebugTaskOracle, evaluate_policy,
                                       make_debug_sequences)
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.models.value_net import ExitController


def test_batched_rollout_matches_sequential():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [0.05, 1e8]
    seqs = make_debug_sequences(4)
    oracle = DebugTaskOracle(threshold=0.05)

    # sequential reference (while-loop engine, single stream)
    pol_seq = ScanDeerPolicy(params, cfg, thresholds=th)
    adapter = CalvinPolicyAdapter(pol_seq, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    ref = evaluate_policy(adapter, env, seqs, {}, oracle, ep_len=15)

    # batched: 2 lanes over the same 4 sequences
    pol_b = ScanDeerPolicy(params, cfg, thresholds=th)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2)]
    out = evaluate_policy_batched(pol_b, envs, seqs, {}, oracle, tok,
                                  text_len=cfg.text_len, ep_len=15)

    assert out["avg_seq_len"] == ref["avg_seq_len"]
    assert out["task_info"] == ref["task_info"]
    np.testing.assert_allclose(out["success_exit_hist"],
                               ref["success_exit_hist"], atol=1e-9)


def test_pipelined_matches_unpipelined():
    """pipeline=2 overlaps host/device work across lane groups but must
    reproduce pipeline=1 results exactly (disjoint envs + carries)."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [0.05, 1e8]
    seqs = make_debug_sequences(6)
    oracle = DebugTaskOracle(threshold=0.05)

    def run(pipeline):
        pol = ScanDeerPolicy(params, cfg, thresholds=th)
        envs = [DebugEnv(img_hw=cfg.vit.image_size,
                         grip_hw=cfg.vit.image_size) for _ in range(4)]
        return evaluate_policy_batched(
            pol, envs, seqs, {}, oracle, tok, text_len=cfg.text_len,
            ep_len=12, pipeline=pipeline)

    a = run(1)
    b = run(2)
    assert a["avg_seq_len"] == b["avg_seq_len"]
    assert a["task_info"] == b["task_info"]
    np.testing.assert_allclose(a["success_exit_hist"],
                               b["success_exit_hist"], atol=1e-9)
    np.testing.assert_allclose(a["fail_exit_hist"], b["fail_exit_hist"],
                               atol=1e-9)


def test_env_workers_matches_serial():
    """Thread-pooled env stepping (env_workers>1) must reproduce serial
    results exactly: envs are independent, bookkeeping stays on the drive
    thread (the pool only fans out env.step calls)."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [0.05, 1e8]
    seqs = make_debug_sequences(6)
    oracle = DebugTaskOracle(threshold=0.05)

    def run(workers):
        pol = ScanDeerPolicy(params, cfg, thresholds=th)
        envs = [DebugEnv(img_hw=cfg.vit.image_size,
                         grip_hw=cfg.vit.image_size,
                         host_latency_ms=1.0) for _ in range(4)]
        return evaluate_policy_batched(
            pol, envs, seqs, {}, oracle, tok, text_len=cfg.text_len,
            ep_len=12, env_workers=workers)

    a = run(0)
    b = run(4)
    assert a["avg_seq_len"] == b["avg_seq_len"]
    assert a["task_info"] == b["task_info"]
    np.testing.assert_allclose(a["success_exit_hist"],
                               b["success_exit_hist"], atol=1e-9)
    np.testing.assert_allclose(a["fail_exit_hist"], b["fail_exit_hist"],
                               atol=1e-9)


def test_batched_rollout_more_lanes_than_sequences():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(4)]
    seqs = make_debug_sequences(2)
    out = evaluate_policy_batched(pol, envs, seqs, {},
                                  DebugTaskOracle(0.05), tok,
                                  text_len=cfg.text_len, ep_len=10)
    assert 0.0 <= out["avg_seq_len"] <= 5.0
    assert len(out["task_info"]) >= 1


def test_batched_exit_waste_report():
    """The lockstep batch runs every lane to the dispatch's deepest exit;
    the report must quantify the forfeited early-exit layers (VERDICT r2
    item 6).  Force lane 0 to the first exit and lane 1 to the last via
    per-lane threshold rows: every dispatch then wastes exactly
    (last - first) layers on lane 0 and none on lane 1."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg)
    e0, e_last = pol.exits[0], pol.exits[-1]
    rows = np.full((2, cfg.n_layers), -1e30, np.float32)
    rows[0, e0] = 1e30
    rows[1, e_last] = 1e30
    pol.set_threshold_array(rows)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2)]
    out = evaluate_policy_batched(
        pol, envs, make_debug_sequences(2), {},
        DebugTaskOracle(threshold=1e9),  # never succeeds: lanes stay in
        tok, text_len=cfg.text_len, ep_len=4, n_layers=cfg.n_layers)
    w = out["batched_exit_waste"]
    assert w["dispatches"] >= 4
    assert w["avg_batch_max_exit"] == pytest.approx(e_last + 1)
    assert w["avg_exit_layer"] == pytest.approx((e0 + e_last) / 2 + 1)
    assert w["avg_wasted_layers_per_step"] == pytest.approx((e_last - e0) / 2)


def test_batched_reset_mode_resets_per_subtask():
    """reset=True: every subtask (after the first) re-resets that lane's
    env to the chain's initial state (eval_utils.py:603-606)."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    seqs = make_debug_sequences(2)
    n_subtasks = len(seqs[0][1])

    resets = []

    class CountingEnv(DebugEnv):
        def __init__(self, tag, **kw):
            self.tag = tag
            super().__init__(**kw)

        def reset(self, robot_obs=None, scene_obs=None):
            resets.append(self.tag)
            return super().reset(robot_obs, scene_obs)

    for want_reset, expected_per_chain in ((False, 1), (True, n_subtasks)):
        pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
        envs = [CountingEnv(i, img_hw=cfg.vit.image_size,
                            grip_hw=cfg.vit.image_size) for i in range(2)]
        oracle = DebugTaskOracle(threshold=0.0)  # instant success: chains
        resets.clear()                            # advance all subtasks
        out = evaluate_policy_batched(pol, envs, seqs, {}, oracle, tok,
                                      text_len=cfg.text_len, ep_len=3,
                                      reset=want_reset)
        assert out["avg_seq_len"] == n_subtasks
        assert len(resets) == 2 * expected_per_chain, (want_reset, resets)
