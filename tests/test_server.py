"""HTTP serving host (serving/server.py + cli/serve.py): protocol, stream
isolation, engine-parity of served actions, error handling, and the AOT
artifact path."""

import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.serving.server import DeerActionServer, make_server


@pytest.fixture(scope="module")
def served():
    import dataclasses
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    policy = ScanDeerPolicy(params, cfg, thresholds=[1e8, 1e8])
    core = DeerActionServer(policy, tok, max_streams=8)
    httpd = make_server(core, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, core, policy, tok, cfg, params
    httpd.shutdown()


def _post(base, path, payload, expect=200):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            assert r.status == expect
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, (e.code, e.read())
        return json.loads(e.read())


def _frame(cfg, seed):
    r = np.random.RandomState(seed)
    return r.randint(0, 255, (64, 48, 3), np.uint8)


def _step_payload(cfg, stream, seed, instruction="push the red block"):
    rgb = _frame(cfg, seed)
    grip = _frame(cfg, seed + 1000)
    return {
        "stream": stream,
        "instruction": instruction,
        "rgb": base64.b64encode(rgb.tobytes()).decode(),
        "rgb_shape": list(rgb.shape),
        "gripper": base64.b64encode(grip.tobytes()).decode(),
        "gripper_shape": list(grip.shape),
    }


def test_healthz_and_step(served):
    base, core, policy, tok, cfg, params = served
    with urllib.request.urlopen(base + "/healthz") as r:
        h = json.loads(r.read())
    assert h["ok"] and h["exits"] == [int(e) for e in policy.exits]

    out = _post(base, "/v1/step", _step_payload(cfg, "arm0", seed=0))
    assert len(out["action"]) == 7
    assert out["exit_layer"] in [int(e) for e in policy.exits]
    assert np.isfinite(out["action"]).all()
    assert out["action"][6] in (-1.0, 1.0)  # gripper binarized


def test_served_actions_match_local_engine(served):
    """The served stream must produce exactly what a local adapter around
    the same engine produces — carry threading included."""
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter
    import copy
    base, core, policy, tok, cfg, params = served

    local = CalvinPolicyAdapter(copy.copy(policy), tok,
                                text_len=cfg.text_len)
    local.reset()
    _post(base, "/v1/reset", {"stream": "parity"})
    for i in range(3):
        payload = _step_payload(cfg, "parity", seed=100 + i)
        served_out = _post(base, "/v1/step", payload)
        obs = {"rgb_obs": {"rgb_static": _frame(cfg, 100 + i),
                           "rgb_gripper": _frame(cfg, 100 + i + 1000)}}
        local_a = local.step(obs, payload["instruction"])
        np.testing.assert_allclose(np.asarray(served_out["action"]),
                                   local_a, rtol=1e-6, atol=1e-6)
        assert served_out["exit_layer"] == local.current_exit_layer


def test_stream_isolation(served):
    """Two streams with different instructions keep independent carries:
    interleaved stepping must equal each stream stepped alone."""
    base, core, policy, tok, cfg, params = served
    _post(base, "/v1/reset", {"stream": "a"})
    _post(base, "/v1/reset", {"stream": "b"})
    a1 = _post(base, "/v1/step",
               _step_payload(cfg, "a", seed=1, instruction="lift the cup"))
    b1 = _post(base, "/v1/step",
               _step_payload(cfg, "b", seed=2, instruction="open the door"))
    a2 = _post(base, "/v1/step",
               _step_payload(cfg, "a", seed=3, instruction="lift the cup"))

    # replay stream a alone on a fresh stream -> identical trajectory
    _post(base, "/v1/reset", {"stream": "a_solo"})
    s1 = _post(base, "/v1/step",
               _step_payload(cfg, "a_solo", seed=1,
                             instruction="lift the cup"))
    s2 = _post(base, "/v1/step",
               _step_payload(cfg, "a_solo", seed=3,
                             instruction="lift the cup"))
    np.testing.assert_allclose(a1["action"], s1["action"], atol=1e-6)
    np.testing.assert_allclose(a2["action"], s2["action"], atol=1e-6)
    assert not np.allclose(a1["action"], b1["action"])


def test_protocol_errors(served):
    base, core, policy, tok, cfg, params = served
    out = _post(base, "/v1/step", {"stream": "x"}, expect=400)
    assert "instruction" in out["error"]
    bad = _step_payload(cfg, "x", seed=0)
    bad["rgb_shape"] = [2, 2, 3]  # bytes mismatch
    out = _post(base, "/v1/step", bad, expect=400)
    assert "bytes" in out["error"]
    out = _post(base, "/v1/nope", {}, expect=404)
    assert "no route" in out["error"]
    # stream cap: fill to max_streams (order-independent of prior tests),
    # overflow refused, close frees a slot
    i = 0
    while len(core._streams) < core.max_streams:
        _post(base, "/v1/reset", {"stream": f"fill{i}"})
        i += 1
    out = _post(base, "/v1/step", _step_payload(cfg, "overflow", 0),
                expect=400)
    assert "limit" in out["error"]
    victim = sorted(core._streams)[0]
    _post(base, "/v1/close", {"stream": victim})
    out = _post(base, "/v1/step", _step_payload(cfg, "overflow", 0))
    assert len(out["action"]) == 7


def test_per_stream_threshold_override(served):
    """/v1/reset thresholds: two streams of the same engine run different
    exit budgets (fast stream exits first layer, slow stream full depth)."""
    base, core, policy, tok, cfg, params = served
    n = len(policy.exits)
    while len(core._streams) > core.max_streams - 2:  # room for fast+slow
        _post(base, "/v1/close", {"stream": sorted(core._streams)[0]})
    _post(base, "/v1/reset", {"stream": "fast", "thresholds": [1e8] * n})
    _post(base, "/v1/reset",
          {"stream": "slow", "thresholds": [-1e8] * (n - 1) + [1e8]})
    f = _post(base, "/v1/step", _step_payload(cfg, "fast", seed=50))
    s = _post(base, "/v1/step", _step_payload(cfg, "slow", seed=50))
    assert f["exit_layer"] == int(policy.exits[0])
    assert s["exit_layer"] == int(policy.exits[-1])
    # malformed override -> 400
    out = _post(base, "/v1/reset", {"stream": "fast", "thresholds": [1.0]},
                expect=400)
    assert "thresholds" in out["error"]
    _post(base, "/v1/close", {"stream": "fast"})
    _post(base, "/v1/close", {"stream": "slow"})


def test_server_diffusion_head_streams():
    """Diffusion-head serving: per-stream clones must not alias the inner
    engine's carry or the sampler's action history; clients get (k, 7)
    plans."""
    import dataclasses
    from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, head_type="diffusion",
                              media_token_id=tok.media_token_id,
                              diff_timesteps=5, diff_horizon=4,
                              n_obs_steps=2, diff_down_dims=(8, 16))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    scan = ScanDeerPolicy(params, cfg, thresholds=[-1.0, 1e8])
    base = DiffusionSamplerPolicy(scan, params, seed=0)
    core = DeerActionServer(base, tok, max_streams=4)

    p1 = _step_payload(cfg, "s1", seed=1)
    p2 = _step_payload(cfg, "s2", seed=2)
    out1 = core.step(p1)
    out2 = core.step(p2)
    plan1 = np.asarray(out1["action"])
    assert plan1.shape == (cfg.diff_horizon - (cfg.n_obs_steps - 1), 7)
    assert np.isfinite(plan1).all()
    # stream isolation: the two adapters wrap distinct sampler + engine
    ads = core._streams
    assert ads["s1"].policy is not ads["s2"].policy
    assert ads["s1"].policy.policy is not ads["s2"].policy.policy
    assert ads["s1"].policy.policy is not base.policy
    # replay s1's first step on a fresh stream -> identical plan
    out1b = core.step(dict(_step_payload(cfg, "s1b", seed=1)))
    np.testing.assert_allclose(np.asarray(out1b["action"]), plan1,
                               atol=1e-6)
    assert out2["exit_layer"] == scan.exits[-1]


def test_serve_cli_with_artifact(tmp_path):
    """cli/serve builds the core from a checkpoint-free tiny model + AOT
    artifact; served step equals the live-engine step (export parity)."""
    import dataclasses
    from deer_vla_tpu.cli.serve import build_core, build_parser
    from deer_vla_tpu.serving.export import export_policy, save_exported

    cfg = deer_tiny()
    # the serve CLI re-points media_token_id at the tokenizer's id
    # (cli.train.make_tokenizer contract) — the artifact must bake the
    # same id or media masking silently diverges
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(42), cfg)
    blob, meta = export_policy(params, cfg, batch_size=1, platforms=("cpu",))
    art = str(tmp_path / "tiny.step")
    save_exported(art, blob, meta)

    args = build_parser().parse_args(
        ["--model", "tiny", "--artifact", art, "--precision", "fp32"])
    core, ccfg = build_core(args)
    h = core.healthz()
    assert h["ok"] and h["exits"] == [int(e) for e in meta["exits"]]
    payload = _step_payload(ccfg, "s", seed=7)
    out = core.step(payload)
    assert len(out["action"]) == 7 and np.isfinite(out["action"]).all()
