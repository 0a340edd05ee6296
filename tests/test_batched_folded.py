"""Batched lanes for window-folded (vit_concat / use_hist) and proprio
(--use_state) models: evaluate_policy_batched must reproduce the sequential
windowed-adapter harness exactly (same per-lane rolling frame window, same
state rows, same engine program math).

Reference protocol being batched: the img_queue / state_queue window feeding
(eval_utils.py:344-386) — the reference only ever runs it one env per rank.
"""

import dataclasses

import jax
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
from deer_vla_tpu.eval.rollout import (CalvinPolicyAdapter, DebugEnv,
                                       DebugTaskOracle, evaluate_policy,
                                       make_debug_sequences)
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer


def make_cfg(tok, mode="post", use_hist=False, window=2, use_state=False):
    cfg = deer_tiny()
    return dataclasses.replace(
        cfg, fusion_mode=mode, use_hist=use_hist, window_size=window,
        use_state=use_state, media_token_id=tok.media_token_id,
        head=dataclasses.replace(cfg.head, window_size=window,
                                 use_state=use_state))


def run_pair(cfg, tok, n_seq=4, lanes=2, ep_len=12, th=(0.05, 1e8)):
    """(sequential report, batched report) on identical DebugEnv streams."""
    params = init_deer(jax.random.PRNGKey(0), cfg)
    seqs = make_debug_sequences(n_seq)
    oracle = DebugTaskOracle(threshold=0.05)

    pol_seq = ScanDeerPolicy(params, cfg, thresholds=list(th))
    adapter = CalvinPolicyAdapter(pol_seq, tok, text_len=cfg.text_len)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    ref = evaluate_policy(adapter, env, seqs, {}, oracle, ep_len=ep_len)

    pol_b = ScanDeerPolicy(params, cfg, thresholds=list(th))
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(lanes)]
    out = evaluate_policy_batched(pol_b, envs, seqs, {}, oracle, tok,
                                  text_len=cfg.text_len, ep_len=ep_len)
    return ref, out


def assert_match(ref, out):
    assert out["avg_seq_len"] == ref["avg_seq_len"]
    assert out["task_info"] == ref["task_info"]
    np.testing.assert_allclose(out["success_exit_hist"],
                               ref["success_exit_hist"], atol=1e-9)
    np.testing.assert_allclose(out["fail_exit_hist"],
                               ref["fail_exit_hist"], atol=1e-9)


def test_batched_vit_concat_matches_sequential():
    """vit_concat lanes: per-lane rolling frame windows fed stream-major
    (B*W image rows, B text rows) must match the windowed adapter."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = make_cfg(tok, mode="vit_concat", window=2)
    assert_match(*run_pair(cfg, tok))


def test_batched_use_hist_matches_sequential():
    """use_hist lanes: frame windows + per-frame tiled goal text (B*W text
    rows); the head runs the full window, carry untouched."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = make_cfg(tok, use_hist=True, window=2)
    assert_match(*run_pair(cfg, tok))


def test_batched_use_state_matches_sequential():
    """Proprio lanes: per-lane robot_obs rows reach the batched program
    (previously --lanes silently dropped the state token)."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = make_cfg(tok, use_state=True, window=2)
    assert_match(*run_pair(cfg, tok))


def test_batched_use_state_vit_concat_matches_sequential():
    """State + window fold: one proprio row per frame in the rolling window
    (the adapter's state_queue), last frame's row at the head."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = make_cfg(tok, mode="vit_concat", window=2, use_state=True)
    assert_match(*run_pair(cfg, tok))


def test_batched_gpt_head_matches_sequential():
    """gpt-head lanes: GPTCarry counts are per-stream, so one lane's
    subtask reset must not clear another lane's rolling history."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = dataclasses.replace(make_cfg(tok, window=2), head_type="gpt")
    assert_match(*run_pair(cfg, tok))


def test_batched_fc_head_matches_sequential():
    """fc-head lanes (stateless head; vit_concat-only per the reference's
    construction restriction, flamingo_mpt.py:157-165)."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = dataclasses.replace(make_cfg(tok, mode="vit_concat", window=2),
                              head_type="fc")
    assert_match(*run_pair(cfg, tok))


def test_folded_shape_validation():
    """dispatch_batch refuses mis-shaped window-folded batches loudly."""
    tok = HashTokenizer(vocab_size=deer_tiny().mpt.vocab_size,
                        max_length=deer_tiny().text_len)
    cfg = make_cfg(tok, mode="vit_concat", window=2)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    hw = cfg.vit.image_size
    img = np.zeros((3, 1, 1, 3, hw, hw), np.float32)  # 3 rows != 2 lanes * 2
    ids = np.full((2, cfg.text_len), 1, np.int32)
    with pytest.raises(ValueError, match="stream-major"):
        pol.dispatch_batch(img, img, ids, np.ones_like(ids))
