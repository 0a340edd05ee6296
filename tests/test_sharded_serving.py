"""Multi-chip batched serving (eval/sharded_serving.py): the while-loop
batched step with the stream batch sharded over the 8-device CPU mesh
produces the same actions/exits as the single-device program."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
from deer_vla_tpu.eval.sharded_serving import ShardedBatchedPolicy
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, B, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(B, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((B, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    return img, grip, jnp.asarray(ids), jnp.ones((B, s), jnp.int32)


def test_sharded_matches_single_device(setup):
    cfg, params = setup
    assert len(jax.devices()) >= 8, "conftest provides the 8-CPU mesh"
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    th = [0.05, 1e8]
    single = ScanDeerPolicy(params, cfg, thresholds=list(th))
    sharded = ShardedBatchedPolicy(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), mesh)

    B = 8
    for step in range(3):
        img, grip, ids, mask = _batch(cfg, B, seed=step)
        a1, e1 = single.step_batch(img, grip, ids, mask)
        a2, e2 = sharded.step_batch(img, grip, ids, mask)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_allclose(a2, a1, rtol=1e-5, atol=1e-5,
                                   err_msg=f"step {step}")

    # the sharded carry really lives batch-sharded on the mesh
    leaf = jax.tree_util.tree_leaves(sharded._carry)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_refusals(setup):
    cfg, params = setup
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    pol = ShardedBatchedPolicy(
        ScanDeerPolicy(params, cfg, thresholds=[0.05, 1e8]), mesh)
    img, grip, ids, mask = _batch(cfg, 6)  # 6 % 8 != 0
    with pytest.raises(AssertionError, match="divisible"):
        pol.step_batch(img, grip, ids, mask)
    cfg_wf = dataclasses.replace(cfg, fusion_mode="vit_concat")
    params_wf = init_deer(jax.random.PRNGKey(0), cfg_wf)
    with pytest.raises(NotImplementedError):
        ShardedBatchedPolicy(
            ScanDeerPolicy(params_wf, cfg_wf, thresholds=[0.05, 1e8]), mesh)


def test_sharded_reset_streams_matches_single(setup):
    """batched_rollout calls reset_streams at every subtask begin
    (eval/batched_rollout.py:126); the sharded wrapper must support it
    and keep the refreshed carry batch-sharded."""
    cfg, params = setup
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    th = [0.05, 1e8]
    single = ScanDeerPolicy(params, cfg, thresholds=list(th))
    sharded = ShardedBatchedPolicy(
        ScanDeerPolicy(params, cfg, thresholds=list(th)), mesh)
    B = 8
    img, grip, ids, mask = _batch(cfg, B, seed=0)
    single.step_batch(img, grip, ids, mask)
    sharded.step_batch(img, grip, ids, mask)
    # reset streams 0 and 3 only, then step again: actions must agree
    m = np.zeros(B, bool)
    m[[0, 3]] = True
    single.reset_streams(m)
    sharded.reset_streams(m)
    leaf = jax.tree_util.tree_leaves(sharded._carry)[0]
    assert len(leaf.sharding.device_set) == 8  # sharding preserved
    img2, grip2, ids2, mask2 = _batch(cfg, B, seed=1)
    a1, e1 = single.step_batch(img2, grip2, ids2, mask2)
    a2, e2 = sharded.step_batch(img2, grip2, ids2, mask2)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_allclose(a2, a1, rtol=1e-5, atol=1e-5)
