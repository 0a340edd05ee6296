"""Micro-batching serving core (serving/batcher.py): concurrent streams
collated into one batched dispatch, parked-lane carry isolation, per-stream
thresholds, and the HTTP surface."""

import base64
import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.serving.batcher import BatchedActionServer
from deer_vla_tpu.serving.server import ServeError


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params, tok


def make_core(cfg, params, tok, lanes=4, window_ms=150.0, thresholds=None):
    pol = ScanDeerPolicy(params, cfg,
                         thresholds=thresholds or [1e8, 1e8])
    return BatchedActionServer(pol, tok, lanes=lanes, window_ms=window_ms)


def _frame(cfg, seed):
    r = np.random.RandomState(seed)
    return r.randint(0, 255, (48, 48, 3), np.uint8)


def _payload(cfg, stream, seed, instruction="push the red block"):
    rgb, grip = _frame(cfg, seed), _frame(cfg, seed + 500)
    return {"stream": stream, "instruction": instruction,
            "rgb": base64.b64encode(rgb.tobytes()).decode(),
            "rgb_shape": list(rgb.shape),
            "gripper": base64.b64encode(grip.tobytes()).decode(),
            "gripper_shape": list(grip.shape)}


def _concurrent_steps(core, payloads):
    results = [None] * len(payloads)

    def run(i):
        results[i] = core.step(payloads[i])

    ts = [threading.Thread(target=run, args=(i,))
          for i in range(len(payloads))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    return results


def test_concurrent_streams_one_dispatch(setup):
    cfg, params, tok = setup
    core = make_core(cfg, params, tok, window_ms=500.0)
    try:
        # pre-register both streams: the micro-batch window only waits
        # for streams that already hold a lane, so without this the loop
        # may dispatch stream a alone under host contention (seen once
        # when the full suite ran next to a training smoke)
        core.reset({"stream": "a"})
        core.reset({"stream": "b"})
        # distinct instructions: a fresh random-init model's x-attn gates
        # are zero (Flamingo init), so only text differentiates streams
        outs = _concurrent_steps(
            core, [_payload(cfg, "a", 1, instruction="lift the cup"),
                   _payload(cfg, "b", 2, instruction="open the door")])
        for o in outs:
            assert len(o["action"]) == 7 and np.isfinite(o["action"]).all()
        # both landed in the same micro-batch (150 ms window)
        assert outs[0]["batched_with"] == outs[1]["batched_with"] == 2
        assert not np.allclose(outs[0]["action"], outs[1]["action"])
        h = core.healthz()
        assert h["mode"] == "batched" and h["steps"] == 2
        # batched-exit waste accounting: both lanes exited somewhere, the
        # dispatch's device depth is their max, waste = max - own
        assert h["avg_wasted_layers_per_step"] >= 0.0
        assert (outs[0]["batch_max_exit"] == outs[1]["batch_max_exit"]
                == max(outs[0]["exit_layer"], outs[1]["exit_layer"]))
    finally:
        core.shutdown()


def test_parked_lane_carry_isolated(setup):
    """Stream B stepping while A sits out a window must not advance A's
    carry: A's trajectory equals a run where A is alone on the server."""
    cfg, params, tok = setup
    core = make_core(cfg, params, tok, window_ms=30.0)
    try:
        a1 = core.step(_payload(cfg, "a", 10))
        _ = core.step(_payload(cfg, "b", 11))   # a parked here
        _ = core.step(_payload(cfg, "b", 12))   # a parked here
        a2 = core.step(_payload(cfg, "a", 13))
    finally:
        core.shutdown()
    solo = make_core(cfg, params, tok, window_ms=30.0)
    try:
        s1 = solo.step(_payload(cfg, "a", 10))
        s2 = solo.step(_payload(cfg, "a", 13))
    finally:
        solo.shutdown()
    np.testing.assert_allclose(a1["action"], s1["action"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a2["action"], s2["action"],
                               rtol=1e-4, atol=1e-4)


def test_per_stream_thresholds_and_reset(setup):
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    exits = core._policy.exits
    try:
        core.reset({"stream": "fast", "thresholds": [1e8] * len(exits)})
        core.reset({"stream": "slow",
                    "thresholds": [-1e8] * (len(exits) - 1) + [1e8]})
        outs = _concurrent_steps(core, [_payload(cfg, "fast", 20),
                                        _payload(cfg, "slow", 20)])
        assert outs[0]["exit_layer"] == int(exits[0])
        assert outs[1]["exit_layer"] == int(exits[-1])
        with pytest.raises(ServeError, match="thresholds"):
            core.reset({"stream": "fast", "thresholds": [1.0]})
    finally:
        core.shutdown()


def test_lane_capacity_and_busy(setup):
    cfg, params, tok = setup
    core = make_core(cfg, params, tok, lanes=2)
    try:
        core.reset({"stream": "a"})
        core.reset({"stream": "b"})
        with pytest.raises(ServeError, match="limit"):
            core.reset({"stream": "c"})
        core.close({"stream": "b"})
        core.reset({"stream": "c"})  # freed lane reusable
        # busy: with a step in flight on the stream, reset/close/step refuse
        from deer_vla_tpu.serving.batcher import _Pending
        core._pending[core._lane_of["a"]] = _Pending(None)
        try:
            with pytest.raises(ServeError, match="busy"):
                core.reset({"stream": "a"})
            with pytest.raises(ServeError, match="busy"):
                core.close({"stream": "a"})
            assert "a" in core._lane_of  # failed close didn't evict
        finally:
            core._pending.clear()
    finally:
        core.shutdown()


def test_lane_reuse_restores_default_thresholds(setup):
    """A freed lane must not leak the previous stream's custom threshold
    row into the next stream assigned to it."""
    cfg, params, tok = setup
    core = make_core(cfg, params, tok, lanes=1)
    exits = core._policy.exits
    try:
        # force 'slow' (lane 0) to full depth, then free the lane
        core.reset({"stream": "slow",
                    "thresholds": [-1e8] * (len(exits) - 1) + [1e8]})
        core.close({"stream": "slow"})
        # new stream on the recycled lane: server default (1e8 everywhere
        # in make_core) exits at the FIRST exit, not slow's last
        out = core.step(_payload(cfg, "fresh", 60))
        assert out["exit_layer"] == int(exits[0])
    finally:
        core.shutdown()


def test_reset_waits_out_dispatch(setup):
    """reset/close block while a dispatch is in flight so the parked-lane
    carry write-back can never clobber their mutation."""
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    try:
        core.reset({"stream": "a"})
        with core._cond:
            core._dispatching = True
        done = threading.Event()

        def do_reset():
            core.reset({"stream": "a"})
            done.set()

        t = threading.Thread(target=do_reset, daemon=True)
        t.start()
        assert not done.wait(timeout=0.3), "reset ran during dispatch"
        with core._cond:
            core._dispatching = False
            core._cond.notify_all()
        assert done.wait(timeout=10), "reset never resumed"
    finally:
        core.shutdown()


def test_new_stream_step_waits_out_dispatch(setup):
    """step() for a stream with NO lane yet must wait out an in-flight
    dispatch: allocation resets the lane's carry row, and the dispatch's
    carry write-back (jnp.where against a pre-reset old_carry) would
    resurrect the previous occupant's LSTM state into the new stream."""
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    try:
        with core._cond:
            core._dispatching = True
        done = threading.Event()

        def do_step():
            core.step(_payload(cfg, "newbie", 11))
            done.set()

        t = threading.Thread(target=do_step, daemon=True)
        t.start()
        assert not done.wait(timeout=0.3)
        with core._cond:
            # the new stream must NOT have been allocated a lane yet
            assert "newbie" not in core._lane_of, \
                "lane allocated during an in-flight dispatch"
            core._dispatching = False
            core._cond.notify_all()
        assert done.wait(timeout=30), "step never resumed"
    finally:
        core.shutdown()


def test_engine_error_is_not_client_error(setup):
    """Engine/device failures surface raw (-> HTTP 500), not ServeError
    (-> 400); and step() after shutdown refuses instead of hanging."""
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    try:
        def boom(*a, **k):
            raise RuntimeError("device fell over")
        core._policy.step_batch = boom
        with pytest.raises(RuntimeError, match="device fell over"):
            core.step(_payload(cfg, "a", 70))
    finally:
        core.shutdown()
    with pytest.raises(ServeError, match="shutting down"):
        core.step(_payload(cfg, "a", 71))


def test_token_cache_bounded(setup):
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    try:
        core._tok_cache_cap = 3
        for i in range(8):
            core._tokens(f"instruction number {i}")
        assert len(core._tok_cache) <= 3
        # most recent still cached
        assert "instruction number 7" in core._tok_cache
    finally:
        core.shutdown()


def test_stage_reuse_per_lane_rows(setup):
    """steps_per_stage>1 in the micro-batcher (value_net.py:284-286): a
    lane's mid-stage dispatch forces its previous exit through its own
    threshold row; a fresh-stage dispatch uses the lane's base row; reset
    restarts the lane's stage counter."""
    cfg, params, tok = setup
    pol = ScanDeerPolicy(params, cfg, thresholds=[-1e8, 1e8],
                         steps_per_stage=2)
    core = BatchedActionServer(pol, tok, lanes=2, window_ms=0.0)
    try:
        rows_log = []
        orig = core._engine.set_threshold_array

        def rec(arr):
            rows_log.append(np.asarray(arr, np.float32).copy())
            return orig(arr)

        core._engine.set_threshold_array = rec
        e0, e_last = pol.exits[0], pol.exits[-1]
        o1 = core.step(_payload(cfg, "a", 1))
        o2 = core.step(_payload(cfg, "a", 2))
        o3 = core.step(_payload(cfg, "a", 3))
        lane = core._lane_of["a"]
        assert core.healthz()["steps_per_stage"] == 2
        # fresh decisions under [-1e8, 1e8] land on the last exit; the
        # mid-stage step REUSES it
        assert o1["exit_layer"] == e_last
        assert o2["exit_layer"] == o1["exit_layer"]
        d1, d2, d3 = rows_log[:3]
        assert d1[lane, e0] == np.float32(-1e8)    # base row (fresh)
        assert d2[lane, e0] == np.float32(-1e30)   # forced: only last exit
        assert d2[lane, e_last] == np.float32(1e30)
        assert d3[lane, e0] == np.float32(-1e8)    # fresh stage again
        assert o3["exit_layer"] == e_last
        # reset restarts the stage counter: the NEXT step is fresh even
        # though the lane sits mid-stage (step 4 of sps=2)
        core.step(_payload(cfg, "a", 4))
        core.reset({"stream": "a"})
        core.step(_payload(cfg, "a", 5))
        assert rows_log[-1][lane, e0] == np.float32(-1e8)
    finally:
        core.shutdown()


def test_stage_reuse_mixed_phases_share_dispatch(setup):
    """Lanes on DIFFERENT stage phases batch together: stream a (mid-stage,
    forced row) and stream b (fresh, base row) land in one dispatch."""
    cfg, params, tok = setup
    pol = ScanDeerPolicy(params, cfg, thresholds=[-1e8, 1e8],
                         steps_per_stage=2)
    core = BatchedActionServer(pol, tok, lanes=2, window_ms=150.0)
    try:
        core.step(_payload(cfg, "a", 1))          # a: step 0 (fresh)
        rows_log = []
        orig = core._engine.set_threshold_array

        def rec(arr):
            rows_log.append(np.asarray(arr, np.float32).copy())
            return orig(arr)

        core._engine.set_threshold_array = rec
        core.reset({"stream": "b"})               # pre-register b's lane
        outs = _concurrent_steps(
            core, [_payload(cfg, "a", 2), _payload(cfg, "b", 3)])
        assert outs[0]["batched_with"] == outs[1]["batched_with"] == 2
        la, lb = core._lane_of["a"], core._lane_of["b"]
        e0 = pol.exits[0]
        d = rows_log[0]
        assert d[la, e0] == np.float32(-1e30)     # a mid-stage: forced
        assert d[lb, e0] == np.float32(-1e8)      # b fresh: base row
    finally:
        core.shutdown()


def _folded_cfg(cfg, use_hist=False, mode=None, use_state=False, window=2):
    return dataclasses.replace(
        cfg, use_hist=use_hist, fusion_mode=mode or cfg.fusion_mode,
        window_size=window, use_state=use_state,
        head=dataclasses.replace(cfg.head, window_size=window,
                                 use_state=use_state))


def _per_stream_core(cfg, params, tok):
    from deer_vla_tpu.serving.server import DeerActionServer
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    return DeerActionServer(pol, tok)


@pytest.mark.parametrize("kind", ["vit_concat", "use_hist"])
def test_batched_folded_matches_per_stream(setup, kind):
    """Window-folded lanes: the micro-batching core's per-lane rolling
    frame window must reproduce the per-stream adapter core exactly, with
    a parked-lane interferer riding along."""
    cfg0, _, tok = setup
    cfg = _folded_cfg(cfg0, use_hist=(kind == "use_hist"),
                      mode=("vit_concat" if kind == "vit_concat" else None))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    core = BatchedActionServer(pol, tok, lanes=2, window_ms=20.0)
    ref = _per_stream_core(cfg, params, tok)
    try:
        got, want = [], []
        for i, seed in enumerate([30, 31, 32]):
            got.append(core.step(_payload(cfg, "a", seed))["action"])
            if i == 1:  # interferer: b steps once, a's window untouched
                core.step(_payload(cfg, "b", 99))
            want.append(ref.step(_payload(cfg, "a", seed))["action"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    finally:
        core.shutdown()


def test_batched_state_required_and_matches(setup):
    """Proprio lanes: robot_obs is mandatory for state models, rides the
    batch as per-frame rows, and matches the per-stream core."""
    cfg0, _, tok = setup
    cfg = _folded_cfg(cfg0, mode="vit_concat", use_state=True)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    core = BatchedActionServer(pol, tok, lanes=2, window_ms=20.0)
    ref = _per_stream_core(cfg, params, tok)
    try:
        with pytest.raises(ServeError, match="robot_obs"):
            core.step(_payload(cfg, "a", 40))
        r = np.random.RandomState(7)
        got, want = [], []
        for seed in (41, 42):
            p = _payload(cfg, "a", seed)
            p["robot_obs"] = r.randn(cfg.state_dim).tolist()
            got.append(core.step(p)["action"])
            want.append(ref.step(p)["action"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    finally:
        core.shutdown()


def test_batched_folded_reset_clears_window(setup):
    """reset must clear the lane's rolling frame window: the next step
    re-left-pads like a fresh stream."""
    cfg0, _, tok = setup
    cfg = _folded_cfg(cfg0, mode="vit_concat")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    core = BatchedActionServer(pol, tok, lanes=2, window_ms=20.0)
    try:
        first = core.step(_payload(cfg, "a", 50))["action"]
        core.step(_payload(cfg, "a", 51))
        core.reset({"stream": "a"})
        again = core.step(_payload(cfg, "a", 50))["action"]
        np.testing.assert_allclose(again, first, rtol=1e-5, atol=1e-5)
    finally:
        core.shutdown()


def test_batched_http_surface(setup):
    """The HTTP handler serves the batched core unchanged."""
    import json
    import urllib.request
    from deer_vla_tpu.serving.server import make_server
    cfg, params, tok = setup
    core = make_core(cfg, params, tok)
    httpd = make_server(core, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            base + "/v1/step",
            data=json.dumps(_payload(cfg, "h", 30)).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["action"]) == 7
        with urllib.request.urlopen(base + "/healthz") as r:
            h = json.loads(r.read())
        assert h["mode"] == "batched"
    finally:
        httpd.shutdown()
        core.shutdown()
