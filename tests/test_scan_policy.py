"""While-loop engine (ScanDeerPolicy): parity with the cond-chain engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.fused_policy import FusedDeerPolicy
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.models.flamingo import init_deer


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


@pytest.mark.parametrize("th", [[1e8, 1e8], [-1.0, 1e8], [0.05, 1e8]])
def test_scan_matches_fused(setup, th):
    cfg, params = setup
    f = FusedDeerPolicy(params, cfg, thresholds=th)
    s = ScanDeerPolicy(params, cfg, thresholds=th)
    for t in range(3):
        img, grip, ids, mask = obs(cfg, seed=t)
        a_f = f.step(img, grip, ids, mask)
        a_s = s.step(img, grip, ids, mask)
        assert s.last_exit_layer == f.last_exit_layer
        np.testing.assert_allclose(a_s, a_f, rtol=2e-4, atol=2e-4)


def test_scan_step_batch(setup):
    """Batched streams: per-stream exits in one dispatch; stream 0 matches a
    single-stream run; per-stream reset works."""
    cfg, params = setup
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    single = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    r = np.random.RandomState(0)
    B = 3
    img = jnp.asarray(r.randn(B, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((B, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((B, cfg.text_len), jnp.int32)
    for t in range(3):
        acts, exits = pol.step_batch(img, img, ids, mask)
        a0 = single.step(img[:1], img[:1], ids[:1], mask[:1])
        assert acts.shape == (B, 7) and exits.shape == (B,)
        assert set(exits.tolist()) <= set(cfg.all_exit_ids())
        assert exits[0] == single.last_exit_layer
        np.testing.assert_allclose(acts[0], a0, rtol=2e-4, atol=2e-4)
    # resetting stream 1 zeroes only its carry
    c_before = np.asarray(pol.carry[0])
    pol.reset_streams(np.array([False, True, False]))
    c_after = np.asarray(pol.carry[0])
    assert np.all(c_after[:, 1] == 0)
    np.testing.assert_array_equal(c_after[:, 0], c_before[:, 0])
    acts2, exits2 = pol.step_batch(img, img, ids, mask)
    assert np.isfinite(acts2).all()


@pytest.fixture(scope="module")
def setup_k2():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(
        cfg, media_token_id=tok.media_token_id,
        head=dataclasses.replace(deer_tiny().head, multi_step_action=2))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("th", [[1e8, 1e8], [0.05, 1e8]])
def test_multi_step_engines_match_host(setup_k2, th):
    """multi_step_action k=2: scan + fused engines emit (k, 7) plans that
    match the host-bucketed DeerPolicy, including exit layers."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController

    cfg, params = setup_k2
    exits = list(cfg.all_exit_ids())
    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    host = DeerPolicy(params, cfg, controller=ctrl)
    s = ScanDeerPolicy(params, cfg, thresholds=list(th))
    f = FusedDeerPolicy(params, cfg, thresholds=list(th))
    for t in range(3):
        img, grip, ids, mask = obs(cfg, seed=t)
        host.set_timestep(t)
        a_h = host.step(img, grip, ids, mask)
        a_s = s.step(img, grip, ids, mask)
        a_f = f.step(img, grip, ids, mask)
        assert a_h.shape == (2, 7) and a_s.shape == (2, 7)
        assert s.last_exit_layer == host.last_exit_layer
        assert f.last_exit_layer == host.last_exit_layer
        np.testing.assert_allclose(a_s, a_h, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(a_f, a_h, rtol=2e-4, atol=2e-4)


def test_multi_step_step_batch_and_rollout(setup_k2):
    """step_batch returns (B, k, 7) plans; the batched rollout harness
    executes each plan over k env steps (one policy dispatch per k)."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.batched_rollout import evaluate_policy_batched
    from deer_vla_tpu.eval.rollout import DebugEnv, DebugTaskOracle

    cfg, params = setup_k2
    pol = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    img, grip, ids, mask = obs(cfg)
    B = 2
    imgB = jnp.tile(img, (B, 1, 1, 1, 1, 1))
    idsB = jnp.tile(ids, (B, 1))
    maskB = jnp.tile(mask, (B, 1))
    acts, exits = pol.step_batch(imgB, imgB, idsB, maskB)
    assert acts.shape == (B, 2, 7) and exits.shape == (B,)

    dispatches = {"n": 0}
    orig = pol.step_batch

    def counting(*a, **kw):
        dispatches["n"] += 1
        return orig(*a, **kw)

    pol.step_batch = counting
    pol.reset()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    envs = [DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
            for _ in range(B)]
    seqs = [(None, ["t"]) for _ in range(B)]
    report = evaluate_policy_batched(
        pol, envs, seqs, {"t": "do t"}, DebugTaskOracle(threshold=1e9), tok,
        text_len=cfg.text_len, ep_len=6, n_layers=cfg.n_layers)
    # 6 env steps per chain at k=2 -> 3 dispatches; lockstep across lanes
    assert dispatches["n"] == 3
    assert report["avg_seq_len"] == 0.0


def test_scan_max_layer_cap(setup):
    """DeeR-S style truncation: max_layer caps the reachable exits."""
    cfg, params = setup
    s = ScanDeerPolicy(params, cfg, thresholds=[-1.0], max_layer=2)
    assert s.exits == [1]
    img, grip, ids, mask = obs(cfg)
    s.step(img, grip, ids, mask)
    assert s.last_exit_layer == 1  # forced exit at the capped layer

def test_packed_matches_unpacked(setup):
    """pack=True (stacked ViT/perceiver + pruned ~60-leaf arg tree) is
    numerically identical to pack=False: linear() casts weights to the
    compute dtype at use, so pre-casting the stacks changes nothing, and
    lax.scan runs the same per-layer math in the same order."""
    cfg, params = setup
    th = [0.05, 1e8]
    packed = ScanDeerPolicy(params, cfg, thresholds=th, pack=True)
    full = ScanDeerPolicy(params, cfg, thresholds=th, pack=False)
    # the packed argument tree is an order of magnitude smaller
    n_packed = len(jax.tree_util.tree_leaves(packed.params))
    n_full = len(jax.tree_util.tree_leaves(full.params))
    assert n_packed < n_full / 3, (n_packed, n_full)
    for t in range(3):
        img, grip, ids, mask = obs(cfg, seed=t)
        a_p = packed.step(img, grip, ids, mask)
        a_f = full.step(img, grip, ids, mask)
        assert packed.last_exit_layer == full.last_exit_layer
        np.testing.assert_allclose(a_p, a_f, rtol=1e-6, atol=1e-6)

def test_packed_bit_identical_bf16(setup):
    """Under bf16 compute the packed path must STILL be bit-identical:
    matmul weights are cast to x.dtype at use either way, and 1-D params
    (LayerNorm scales/biases) keep their original dtype in the stacks
    (ops.layers.stack_layer_tree)."""
    from deer_vla_tpu.core.config import DTypePolicy
    cfg, params = setup
    cfg16 = dataclasses.replace(cfg, dtypes=DTypePolicy(
        param_dtype="float32", compute_dtype="bfloat16"))
    th = [0.05, 1e8]
    packed = ScanDeerPolicy(params, cfg16, thresholds=th, pack=True)
    full = ScanDeerPolicy(params, cfg16, thresholds=th, pack=False)
    for t in range(2):
        img, grip, ids, mask = obs(cfg16, seed=t)
        a_p = packed.step(img, grip, ids, mask)
        a_f = full.step(img, grip, ids, mask)
        assert packed.last_exit_layer == full.last_exit_layer
        np.testing.assert_array_equal(a_p, a_f)


def test_state_model_through_scan_engine(setup):
    """--use_state models get the single-program while-loop path (round 2):
    proprio reaches the state_fc media token AND the head's embed_state,
    matching the host-bucketed DeerPolicy bit for bit."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    base, _ = setup
    cfg = dataclasses.replace(
        base, use_state=True,
        head=dataclasses.replace(base.head, use_state=True))
    params = init_deer(jax.random.PRNGKey(1), cfg)
    th = {e: t for e, t in zip(cfg.all_exit_ids(), [0.05, 1e8])}
    scan = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    ctrl = ExitController(exit_id_list=list(cfg.all_exit_ids()),
                          max_layer=cfg.n_layers)
    ctrl.set_thresholds(th)
    host = DeerPolicy(params, cfg, controller=ctrl)
    r = np.random.RandomState(0)
    for t in range(3):
        img, grip, ids, mask = obs(cfg, seed=t)
        state = jnp.asarray(r.randn(1, 1, 1, cfg.state_dim), jnp.float32)
        a_s = scan.step(img, grip, ids, mask, state=state)
        a_h = host.step(img, grip, ids, mask, state=state)
        assert scan.last_exit_layer == host.last_exit_layer
        np.testing.assert_allclose(a_s, a_h, rtol=2e-4, atol=2e-4)
    # state changes the action (the thread is live, not a no-op)
    img, grip, ids, mask = obs(cfg, seed=9)
    scan2 = ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8])
    a1 = scan2.step(img, grip, ids, mask,
                    state=jnp.zeros((1, 1, 1, cfg.state_dim), jnp.float32))
    scan2.reset()
    a2 = scan2.step(img, grip, ids, mask,
                    state=jnp.ones((1, 1, 1, cfg.state_dim), jnp.float32))
    assert not np.allclose(a1, a2)
