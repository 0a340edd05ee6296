"""TCP frame transforms (utils/tcp.py) + --tcp_rel wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.utils.tcp import (euler_angles_to_matrix,
                                    matrix_to_euler_angles,
                                    tcp_to_world_frame, world_to_tcp_frame)


def _rand_actions(r, shape):
    a = r.uniform(-0.5, 0.5, shape + (7,)).astype(np.float32)
    a[..., 6] = np.sign(a[..., 6])
    return a


def _rand_obs(r, shape):
    ro = r.uniform(-0.5, 0.5, shape + (15,)).astype(np.float32)
    ro[..., 3:6] = r.uniform(-1.0, 1.0, shape + (3,))  # euler pose
    return ro


def test_euler_matrix_roundtrip():
    r = np.random.RandomState(0)
    e = jnp.asarray(r.uniform(-1.2, 1.2, (32, 3)), jnp.float32)
    e2 = matrix_to_euler_angles(euler_angles_to_matrix(e))
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e), atol=1e-5)


def test_world_tcp_world_roundtrip():
    """tcp_to_world_frame inverts world_to_tcp_frame at the same robot_obs;
    gripper passes through untouched; position norm is preserved (rotation
    only)."""
    r = np.random.RandomState(1)
    a = jnp.asarray(_rand_actions(r, (8,)))
    ro = jnp.asarray(_rand_obs(r, (8,)))
    tcp = world_to_tcp_frame(a, ro)
    back = tcp_to_world_frame(tcp, ro)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(tcp[..., 6]), np.asarray(a[..., 6]))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(tcp[..., :3]), axis=-1),
                               np.linalg.norm(np.asarray(a[..., :3]), axis=-1),
                               atol=1e-5)


def test_tcp_rel_prepare_batch_and_adapter():
    """--tcp_rel end to end: prepare_batch converts labels world->tcp with
    robot_obs (incl. (B, W, k, 7) multi-step), and the eval adapter converts
    the policy's tcp action back to world frame."""
    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter
    from deer_vla_tpu.train.trainer import TrainConfig, prepare_batch

    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    r = np.random.RandomState(2)
    bs, w, hw = 2, cfg.window_size, cfg.vit.image_size
    ids, mask = tok(["do x"] * bs)
    raw = {
        "rgb_static": r.randint(0, 255, (bs, w, hw, hw, 3), np.uint8),
        "rgb_gripper": r.randint(0, 255, (bs, w, hw, hw, 3), np.uint8),
        "input_ids": ids, "attention_mask": mask,
        "actions": _rand_actions(r, (bs, w)),
        "robot_obs": _rand_obs(r, (bs, w)),
    }
    tcfg = TrainConfig(batch_size=bs, tcp_rel=True, rgb_pad=0, gripper_pad=0)
    batch = prepare_batch(raw, cfg, jax.random.PRNGKey(0), tcfg)
    expect = world_to_tcp_frame(jnp.asarray(raw["actions"]),
                                jnp.asarray(raw["robot_obs"]))
    np.testing.assert_allclose(np.asarray(batch["labels"]),
                               np.asarray(expect), atol=1e-5)
    # multi-step labels (B, W, k, 7): frame state broadcasts over k
    k = 2
    raw_k = dict(raw, actions=_rand_actions(r, (bs, w, k)))
    batch_k = prepare_batch(raw_k, cfg, jax.random.PRNGKey(0), tcfg)
    expect_k0 = world_to_tcp_frame(jnp.asarray(raw_k["actions"][:, :, 0]),
                                   jnp.asarray(raw["robot_obs"]))
    np.testing.assert_allclose(np.asarray(batch_k["labels"][:, :, 0]),
                               np.asarray(expect_k0), atol=1e-5)

    class TcpPolicy:
        cfg = deer_tiny()
        last_exit_layer = 1

        def step(self, img, grip, ids, mask, state=None):
            return np.asarray([0.1, 0.2, -0.1, 0.05, 0.0, -0.05, 1.0],
                              np.float32)

        def reset(self):
            pass

    adapter = CalvinPolicyAdapter(TcpPolicy(), tok, text_len=cfg.text_len,
                                  tcp_rel=True)
    ro = _rand_obs(r, ())
    obs = {"rgb_obs": {"rgb_static": r.randint(0, 255, (hw, hw, 3), np.uint8),
                       "rgb_gripper": r.randint(0, 255, (hw, hw, 3), np.uint8)},
           "robot_obs": ro}
    out = adapter.step(obs, "do x")
    tcp_action = TcpPolicy().step(None, None, None, None)
    expect = tcp_to_world_frame(jnp.asarray(tcp_action[None]),
                                jnp.asarray(ro[None]))[0]
    np.testing.assert_allclose(out, np.asarray(expect), atol=1e-5)
    assert out[-1] == 1.0