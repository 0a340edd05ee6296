"""Native-resolution gripper tower (cfg.gripper_res / --gripper_res).

The reference upsamples CALVIN's 84x84 wrist camera to 224 only because its
open_clip preprocess is fixed-res (robot_flamingo/models/factory.py:109-114).
Here the shared ViT runs each camera at its own resolution with position
embeddings interpolated to the grid (models/vit.resize_pos_embed), cutting
the gripper tower to (g_grip/g_static)^2 of the static cost.

Covers: pos-embed interpolation identity + grid math, variable-resolution
ViT forwards (list/stacked), camera routing (dual_camera_tokens split vs
doubled batch), fusion-mode coverage, equal-size equivalence to the default
path, train forward + grads, end-to-end serving through the while-loop and
bucketed engines (+ their equivalence), frame-cached window-folded serving,
FLOPs accounting, and config JSON round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import (dual_camera_tokens, encode_vision,
                                          forward_train, init_deer)


@pytest.fixture(scope="module")
def setup():
    cfg = deer_tiny()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _frames(cfg, seed=0, grip_hw=None, b=2):
    r = np.random.RandomState(seed)
    hw = cfg.vit.image_size
    ghw = grip_hw or (cfg.gripper_res or hw)
    img = jnp.asarray(r.randn(b, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(b, 1, 1, 3, ghw, ghw), jnp.float32)
    return img, grip


# ---------------------------------------------------------------------------
# pos-embed interpolation
# ---------------------------------------------------------------------------


def test_resize_pos_embed_identity_and_grid():
    from deer_vla_tpu.models.vit import resize_pos_embed
    r = np.random.RandomState(1)
    pos = jnp.asarray(r.randn(17, 8), jnp.float32)  # 4x4 grid + CLS
    same = resize_pos_embed(pos, 16)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pos), atol=1e-6)
    down = resize_pos_embed(pos, 4)  # 2x2
    assert down.shape == (5, 8)
    # CLS row untouched
    np.testing.assert_array_equal(np.asarray(down[0]), np.asarray(pos[0]))
    # bilinear downsample stays inside the source value range per channel
    src = np.asarray(pos[1:]).reshape(4, 4, 8)
    d = np.asarray(down[1:])
    assert (d <= src.max(axis=(0, 1)) + 1e-5).all()
    assert (d >= src.min(axis=(0, 1)) - 1e-5).all()


def test_vit_forward_variable_resolution(setup):
    """The same tower runs a smaller input: token count follows the input
    grid, list and stacked paths agree."""
    from deer_vla_tpu.models.vit import (stack_vit_blocks, vit_forward,
                                         vit_forward_stacked)
    cfg, params = setup
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 3, 14, 14), jnp.float32)  # 1x1 grid
    pooled, tokens = vit_forward(params["vit"], x, cfg.vit)
    assert tokens.shape == (2, 1, cfg.vit.width)
    stacked = stack_vit_blocks(params["vit"])
    p2, t2 = vit_forward_stacked(params["vit"], stacked, x, cfg.vit)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(t2),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# camera routing + fusion
# ---------------------------------------------------------------------------


def test_dual_camera_tokens_split_on_resolution(setup):
    cfg, params = setup
    img, grip = _frames(cfg, grip_hw=14)
    tr, tg = dual_camera_tokens(params, img, grip, cfg)
    assert tr.shape[3] == cfg.vit.num_patches
    assert tg.shape[3] == 1  # 14/14 = 1x1 grid
    # same-res path still returns full-grid tokens for both
    img2, grip2 = _frames(cfg, grip_hw=cfg.vit.image_size)
    tr2, tg2 = dual_camera_tokens(params, img2, grip2, cfg)
    assert tr2.shape == tg2.shape


@pytest.mark.parametrize("fusion", ["post", "pre", "vit_concat"])
def test_encode_vision_media_token_count_unchanged(setup, fusion):
    """The perceiver emits a FIXED latent count per camera, so media shape
    (what the decoder cross-attends to) is identical with and without the
    native-res gripper — only the ViT work shrinks."""
    cfg0, params = setup
    w = cfg0.window_size
    for gres in (0, 14):
        cfg = dataclasses.replace(cfg0, fusion_mode=fusion, gripper_res=gres)
        b = w if fusion == "vit_concat" else 2
        img, grip = _frames(cfg, grip_hw=gres or None, b=b)
        media = encode_vision(params, img, grip, cfg,
                              window_size=w if fusion == "vit_concat" else 1)
        if gres == 0:
            want = media.shape
        else:
            assert media.shape == want, (fusion, media.shape, want)


def test_equal_size_matches_default_path(setup):
    """gripper_res == image_size must reproduce the default doubled-batch
    encode (separate passes are the same math)."""
    cfg0, params = setup
    img, grip = _frames(cfg0)
    base = encode_vision(params, img, grip, cfg0)
    cfg = dataclasses.replace(cfg0, gripper_res=cfg0.vit.image_size)
    # force the separate-pass route through dual_camera_tokens by shape:
    # same shapes take the doubled-batch branch, so instead check the
    # fusion's per-camera perceiver route via differing token counts is
    # exercised elsewhere; here equal-size configs must be bit-identical
    out = encode_vision(params, img, grip, cfg)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_forward_train_and_grads_gripper_res(setup):
    cfg0, params = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    bw = cfg.window_size
    img, grip = _frames(cfg, b=bw)
    r = np.random.RandomState(3)
    ids = np.full((bw, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    ids = jnp.asarray(ids)
    mask = jnp.ones((bw, cfg.text_len), jnp.int32)
    out = forward_train(params, img, ids, mask, cfg, jax.random.PRNGKey(0),
                        vision_gripper=grip)
    assert np.isfinite(np.asarray(out.final_output.actions)).all()

    from deer_vla_tpu.train.losses import multi_exit_loss
    labels = jnp.asarray(np.clip(r.randn(1, bw, 7) * 0.3, -1, 1), jnp.float32)

    def loss_fn(p):
        o = forward_train(p, img, ids, mask, cfg, jax.random.PRNGKey(0),
                          vision_gripper=grip)
        return multi_exit_loss(o, labels)[0]

    g = jax.grad(loss_fn)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_prepare_batch_preps_gripper_native(setup):
    from deer_vla_tpu.train.trainer import TrainConfig, prepare_batch
    cfg0, _ = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    r = np.random.RandomState(4)
    b, w = 2, cfg.window_size
    raw = {
        "rgb_static": r.randint(0, 255, (b, w, 40, 40, 3), dtype=np.uint8),
        "rgb_gripper": r.randint(0, 255, (b, w, 14, 14, 3), dtype=np.uint8),
        "input_ids": np.full((b, cfg.text_len), 7, np.int64),
        "attention_mask": np.ones((b, cfg.text_len), np.int64),
        "actions": r.randn(b, w, 7).astype(np.float32),
    }
    batch = prepare_batch(raw, cfg, jax.random.PRNGKey(0), TrainConfig())
    assert batch["image"].shape[-1] == cfg.vit.image_size
    assert batch["gripper"].shape[-1] == 14


# ---------------------------------------------------------------------------
# serving
# ---------------------------------------------------------------------------


def _serve_inputs(cfg, seed=0):
    r = np.random.RandomState(seed)
    hw = cfg.vit.image_size
    ghw = cfg.gripper_res or hw
    img = r.randn(1, 1, 1, 3, hw, hw).astype(np.float32)
    grip = r.randn(1, 1, 1, 3, ghw, ghw).astype(np.float32)
    ids = np.full((1, cfg.text_len), 7, np.int32)
    ids[0, 0] = cfg.media_token_id
    return img, grip, ids, np.ones((1, cfg.text_len), np.int32)


def test_scan_and_bucketed_engines_agree_gripper_res(setup):
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    cfg0, params = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    sp = ScanDeerPolicy(params, cfg)
    th = [1e8] * len(sp.exits)
    ctrl = ExitController(exit_id_list=list(sp.exits), max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(sp.exits, th)})
    bp = DeerPolicy(params, cfg, controller=ctrl)
    sp.set_thresholds(list(th))
    for i in range(3):
        img, grip, ids, mask = _serve_inputs(cfg, seed=10 + i)
        bp.set_timestep(i)
        a = sp.step(img, grip, ids, mask)
        b = bp.step(img, grip, ids, mask)
        assert sp.last_exit_layer == bp.last_exit_layer
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
        assert np.isfinite(np.asarray(a)).all()


def test_scan_policy_dynamic_exit_gripper_res(setup):
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg0, params = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    sp = ScanDeerPolicy(params, cfg)
    sp.set_thresholds([-1e8] * (len(sp.exits) - 1) + [1e8])
    img, grip, ids, mask = _serve_inputs(cfg)
    a = sp.step(img, grip, ids, mask)
    assert sp.last_exit_layer in cfg.all_exit_ids()
    assert np.isfinite(np.asarray(a)).all()


def test_frame_cache_window_folded_gripper_res(setup):
    """vit_concat + FrameCachePolicy: the per-frame token cache carries
    different token counts per camera through encode_frame's split path."""
    from deer_vla_tpu.eval.caching import FrameCachePolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg0, params0 = setup
    cfg = dataclasses.replace(cfg0, fusion_mode="vit_concat", gripper_res=14)
    params = init_deer(jax.random.PRNGKey(1), cfg)
    w = cfg.window_size
    sp = ScanDeerPolicy(params, cfg)
    fc = FrameCachePolicy(ScanDeerPolicy(params, cfg))
    th = [1e8] * len(sp.exits)
    sp.set_thresholds(list(th))
    fc.set_thresholds(list(th))
    # windowed protocol: full window to sp, newest frame to fc
    frames = [_serve_inputs(cfg, seed=20 + i) for i in range(3)]
    imgs, grips = [], []
    for i, (img, grip, ids, mask) in enumerate(frames):
        imgs.append(img)
        grips.append(grip)
        pad_i = [imgs[0]] * (w - len(imgs)) + imgs
        pad_g = [grips[0]] * (w - len(grips)) + grips
        a_full = sp.step(np.concatenate(pad_i, 0), np.concatenate(pad_g, 0),
                         ids, mask)
        a_cache = fc.step(img, grip, ids, mask)
        np.testing.assert_allclose(np.asarray(a_full), np.asarray(a_cache),
                                   rtol=1e-4, atol=1e-4)


def test_adapter_preps_gripper_native(setup):
    from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg0, params = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    sp = ScanDeerPolicy(params, cfg)
    sp.set_thresholds([1e8] * len(sp.exits))

    def text_fn(goals):
        ids = np.full((len(goals), cfg.text_len), 7, np.int64)
        ids[:, 0] = cfg.media_token_id
        return ids, np.ones_like(ids)

    ad = CalvinPolicyAdapter(sp, text_fn, text_len=cfg.text_len)
    r = np.random.RandomState(5)
    obs = {"rgb_obs": {
        "rgb_static": r.randint(0, 255, (40, 40, 3), dtype=np.uint8),
        "rgb_gripper": r.randint(0, 255, (84, 84, 3), dtype=np.uint8)}}
    a = ad.step(obs, "debug task")
    assert np.isfinite(np.asarray(a)).all()
    # all-1e8 thresholds: the engine exits at the FIRST exit
    assert sp.last_exit_layer == cfg.all_exit_ids()[0]


# ---------------------------------------------------------------------------
# accounting + config plumbing
# ---------------------------------------------------------------------------


def test_flops_drop_and_accounting(setup):
    from deer_vla_tpu.eval.flops import (full_step_flops, gripper_vit_cfg,
                                         train_step_flops, vit_flops)
    cfg0, _ = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    e = cfg.n_layers - 1
    assert full_step_flops(cfg, e) < full_step_flops(cfg0, e)
    assert train_step_flops(cfg) < train_step_flops(cfg0)
    gv = gripper_vit_cfg(cfg)
    assert gv.image_size == 14 and gv.num_patches == 1
    assert vit_flops(gv) < vit_flops(cfg.vit)
    # 3B at 84: the dual-camera vision cost drops to ~57% of exact
    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.flops import vision_flops
    big = MODEL_REGISTRY["mpt_dolly_3b"](max_layer=12)
    big_g = dataclasses.replace(big, gripper_res=84)
    ratio = vision_flops(big_g) / vision_flops(big)
    assert 0.5 < ratio < 0.65, ratio


def test_config_json_roundtrip_and_validation(setup):
    from deer_vla_tpu.core.config import DeerConfig
    cfg0, _ = setup
    cfg = dataclasses.replace(cfg0, gripper_res=14)
    back = DeerConfig.from_json(cfg.to_json())
    assert back.gripper_res == 14
    # old sidecars (no key) default to off
    import json
    raw = json.loads(cfg.to_json())
    raw.pop("gripper_res")
    assert DeerConfig.from_json(json.dumps(raw)).gripper_res == 0


def test_cli_train_eval_inherit_gripper_res(tmp_path):
    """--gripper_res bakes into the ckpt sidecar; eval inherits it and
    serves the DebugEnv rollout end-to-end (adapter preps the 84x84 debug
    wrist frames straight to 14)."""
    from deer_vla_tpu.cli import eval as eval_cli
    from deer_vla_tpu.cli import train as train_cli
    run = str(tmp_path / "r")
    train_cli.main(["--debug", "--model", "tiny", "--num_joint_epochs", "1",
                    "--num_exit_epochs", "0", "--batch_size_calvin", "2",
                    "--gripper_res", "14", "--run_name", run])
    import json
    with open(run + "/deer_0.json") as f:
        sidecar = json.load(f)
    assert sidecar["config"]["gripper_res"] == 14
    rep = str(tmp_path / "rep.json")
    eval_cli.main(["--debug", "--evaluate_from_checkpoint",
                   run + "/deer_0.ckpt", "--num_sequences_override", "2",
                   "--exit_ratio", "1.0", "--calib_batches", "1",
                   "--report_json", rep])
    import json
    with open(rep) as f:
        report = json.load(f)
    assert report["report"]["avg_seq_len"] >= 0


def test_stacked_peak_composition_w8a8_tome_gripper():
    """Pins the bench's stacked-peak program composition (bench.py
    batched32 peak: ONE quantized tree serves the exact program AND a
    tome+gripper_res program): build a w8a8 tree, then run a second step
    program built from cfg(tome_r, gripper_res) on the SAME tree."""
    from types import SimpleNamespace

    from deer_vla_tpu.core.config import MODEL_REGISTRY
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy, build_scan_step
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.ops.lstm import zero_carry

    cfg = MODEL_REGISTRY["tiny"]()
    # 4x4 patch grid so tome r=1 has room; gripper at one patch (14)
    cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, image_size=56))
    cfg_p = dataclasses.replace(
        cfg, gripper_res=14,
        vit=dataclasses.replace(cfg.vit, tome_r=1))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    exits = list(cfg.all_exit_ids())
    pol = ScanDeerPolicy(params, cfg, thresholds=[1e8] * len(exits),
                         quantize="int8_w8a8")
    pk = SimpleNamespace(params=pol.params, stacked=pol.stacked,
                         _step=build_scan_step(cfg_p, exits, "L2", None)[0])
    hw, s = cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(2, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(2, 1, 1, 3, 14, 14), jnp.float32)
    ids = np.full((2, s), 11, np.int32)
    ids[:, 0] = cfg.media_token_id
    th = np.full(cfg.n_layers, -1e30, np.float32)
    for e in exits:
        th[e] = -1e8
    th[exits[-1]] = 1e30
    carry = zero_carry(cfg.head.lstm_num_layers, 2, cfg.head.hidden_size,
                       jnp.float32)
    arm, gp, carry, el = pk._step(pk.params, pk.stacked, img, grip,
                                  jnp.asarray(ids),
                                  jnp.ones((2, s), jnp.int32), carry,
                                  jnp.asarray(th))
    assert np.isfinite(np.asarray(arm)).all()
    assert int(el[0]) == exits[-1]
