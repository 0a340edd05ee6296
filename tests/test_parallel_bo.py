"""Parallel multi-candidate threshold search: per-stream thresholds in the
while-loop engine, the candidates= batched rollout, the q-batch GP, and the
bayes_opt --parallel CLI."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params, tok


def _batch_inputs(cfg, b, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((b, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, grip, jnp.asarray(ids), jnp.ones((b, s), jnp.int32)


def test_per_stream_thresholds_exit_independently(setup):
    """One dispatch, (B, n_layers) thresholds: stream 0 forced to the first
    exit, stream 1 to full depth; actions match the shared-threshold runs
    of the same streams."""
    cfg, params, _ = setup
    pol = ScanDeerPolicy(params, cfg)
    exits = pol.exits
    pol.set_thresholds_batch([[1e8] * len(exits),              # first exit
                              [-1e8] * (len(exits) - 1) + [1e8]])  # full
    img, grip, ids, mask = _batch_inputs(cfg, 2, seed=0)
    acts, els = pol.step_batch(img, grip, ids, mask)
    assert els[0] == exits[0] and els[1] == exits[-1]

    # reference runs with SHARED thresholds on the same 2-stream batch
    ref_first = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits))
    a_f, el_f = ref_first.step_batch(img, grip, ids, mask)
    ref_full = ScanDeerPolicy(
        params, cfg, thresholds=[-1e8] * (len(exits) - 1) + [1e8])
    a_d, el_d = ref_full.step_batch(img, grip, ids, mask)
    np.testing.assert_allclose(acts[0], a_f[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(acts[1], a_d[1], rtol=1e-5, atol=1e-5)


def test_candidates_batched_rollout_isolated_reports(setup):
    """candidates=: each candidate evaluates ALL sequences with its own
    thresholds; exit statistics differ accordingly."""
    from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           make_debug_sequences)
    cfg, params, tok = setup
    pol = ScanDeerPolicy(params, cfg)
    exits = pol.exits
    n_seq, lanes_per = 3, 2
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2 * lanes_per)]
    seqs = make_debug_sequences(n_seq)
    cands = [[1e8] * len(exits),                       # always first exit
             [-1e8] * (len(exits) - 1) + [1e8]]        # always full depth
    reports = evaluate_policy_batched(
        pol, envs, seqs, {}, DebugTaskOracle(threshold=0.05), tok,
        text_len=cfg.text_len, ep_len=20, n_layers=cfg.n_layers,
        candidates=cands)
    assert len(reports) == 2
    for rep in reports:
        # every candidate covered the whole sequence list
        assert len(rep["chain_sr"]) >= 1
    h0 = np.asarray(reports[0]["success_exit_hist"]) + \
        np.asarray(reports[0]["fail_exit_hist"])
    h1 = np.asarray(reports[1]["success_exit_hist"]) + \
        np.asarray(reports[1]["fail_exit_hist"])
    # candidate 0 exits only at the first exit layer; candidate 1 only at
    # the last
    assert h0.sum() > 0 and h1.sum() > 0
    assert h0[exits[0]] == h0.sum()
    assert h1[exits[-1]] == h1.sum()
    # mismatched lane/candidate counts refuse loudly
    with pytest.raises(ValueError, match="divisible"):
        evaluate_policy_batched(
            pol, envs[:3], seqs, {}, DebugTaskOracle(), tok,
            text_len=cfg.text_len, ep_len=8, candidates=cands)


def test_batched_stage_reuse_rows(setup):
    """--steps_per_stage in the batched rollout: mid-stage dispatches force
    each stream's previous exit through per-stream threshold rows; fresh
    stage steps restore the pristine base rows.  A dispatch whose rows
    already sit in the engine (step 0: all lanes active and fresh) skips
    the redundant set_threshold_array call entirely."""
    from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
    from deer_vla_tpu.eval.rollout import (DebugEnv, DebugTaskOracle,
                                           make_debug_sequences)
    cfg, params, tok = setup
    pol = ScanDeerPolicy(params, cfg, steps_per_stage=2)
    exits = pol.exits
    pol.set_thresholds([1e8] * len(exits))  # fresh decisions: first exit
    rows_log = []
    orig = pol.set_threshold_array

    def recorder(arr):
        rows_log.append(np.asarray(arr, np.float32).copy())
        return orig(arr)

    pol.set_threshold_array = recorder
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(2)]
    evaluate_policy_batched(
        pol, envs, make_debug_sequences(2), {},
        DebugTaskOracle(threshold=1e9),  # never succeeds: no mid-run resets
        tok, text_len=cfg.text_len, ep_len=4, n_layers=cfg.n_layers)
    assert len(rows_log) >= 2
    # dispatch 1 (step 0, fresh, all active): the engine already holds the
    # pristine base rows, so NO set_threshold_array call happens — the
    # first recorded call is the step-1 mid-stage force, where both streams
    # force their previous exit (the first exit layer under these
    # thresholds)
    forced = rows_log[0]
    assert forced.shape == (2, cfg.n_layers)
    assert forced[0, exits[0]] == np.float32(1e30)
    assert (forced[0][np.arange(cfg.n_layers) != exits[0]]
            == np.float32(-1e30)).all()
    # dispatch 3 (step 2, fresh stage): the pristine base rows are RESTORED
    # with an explicit call (the engine held dirty forced rows)
    assert rows_log[1][0, exits[0]] == np.float32(1e8)
    assert (rows_log[1][0] == rows_log[1][1]).all()


def test_gp_batch_converges_quadratic():
    """q-batch constant-liar GP finds the quadratic minimum and calls the
    objective in q-sized batches."""
    from deer_vla_tpu.utils.gp_opt import gp_minimize_lite_batch
    calls = []

    def fb(points):
        calls.append(len(points))
        return [sum((x - 0.3) ** 2 for x in p) for p in points]

    res = gp_minimize_lite_batch(fb, [(-1.0, 1.0), (-1.0, 1.0)], q=4,
                                 n_calls=24, random_state=0)
    assert max(calls) <= 4 and sum(calls) == 24
    assert res.fun < 0.05, (res.x, res.fun)


def test_bayes_opt_cli_parallel_smoke():
    """--parallel 2: one batched rollout per GP round, debug env, tiny
    model; prints optimal thresholds."""
    import contextlib
    import io
    from deer_vla_tpu.cli.bayes_opt import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--debug", "--num_seq", "2", "--n_calls", "4",
              "--parallel", "2", "--lanes_per_candidate", "2",
              "--precision", "fp32"])
    out = buf.getvalue()
    assert "Optimal thresholds:" in out
    assert out.count("BO eval") >= 4  # 2 rounds x 2 candidates
