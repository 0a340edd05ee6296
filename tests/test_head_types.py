"""End-to-end head_type routing tests: config -> init -> train step ->
serving (the reference's decoder_type selection, flamingo_mpt.py:149-182,
train flag train_calvin_post_strategy.py:308,317, eval sampling branch
eval_utils.py:388-419)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import (checkpoint_mask, init_deer,
                                          trainable_mask)


def tiny_cfg(head_type, **kw):
    cfg = deer_tiny()
    extra = {}
    if head_type == "diffusion":
        extra = dict(diff_timesteps=5, diff_horizon=4, n_obs_steps=2,
                     diff_down_dims=(8, 16))
    extra.update(kw)
    return dataclasses.replace(cfg, head_type=head_type, **extra)


def make_batch(cfg, bs=2, seed=0):
    w, hw, s = cfg.window_size, cfg.vit.image_size, cfg.text_len
    r = np.random.RandomState(seed)
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    if cfg.fusion_mode == "vit_concat":
        ids = ids[:bs]
    return {
        "image": jnp.asarray(r.randn(bs * w, 1, 1, 3, hw, hw), jnp.float32),
        "gripper": jnp.asarray(r.randn(bs * w, 1, 1, 3, hw, hw), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones_like(jnp.asarray(ids)),
        "labels": jnp.asarray(np.clip(r.randn(bs, w, 7), -1, 1), jnp.float32),
    }


def run_one_step(cfg):
    from deer_vla_tpu.train.optimizer import make_optimizer
    from deer_vla_tpu.train.train_step import init_train_state, make_train_step
    params = init_deer(jax.random.PRNGKey(0), cfg)
    # host copies: the train step donates its input state's buffers
    params_before = jax.tree_util.tree_map(np.asarray, params)
    mask = trainable_mask(params, cfg, "joint")
    opt = make_optimizer(params, cfg, phase="joint", learning_rate=1e-3,
                         warmup_steps=0, total_steps=10, trainable=mask)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, phase="joint")
    state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    return params_before, state, m


@pytest.mark.parametrize("head_type,kw", [
    ("fc", {"fusion_mode": "vit_concat"}),
    ("gpt", {}),
    ("diffusion", {}),
])
def test_train_step_per_head(head_type, kw):
    cfg = tiny_cfg(head_type, **kw)
    params, state, m = run_one_step(cfg)
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0
    # head params moved
    before = jax.tree_util.tree_leaves(params["extra_exit"])[0]
    after = jax.tree_util.tree_leaves(state.params["extra_exit"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_diffusion_unet_trains_norm_frozen():
    cfg = tiny_cfg("diffusion")
    params, state, _ = run_one_step(cfg)
    u0 = jax.tree_util.tree_leaves(params["diffusion"]["unet"])[0]
    u1 = jax.tree_util.tree_leaves(state.params["diffusion"]["unet"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1)), \
        "U-Net must train (factory.py:232)"
    np.testing.assert_array_equal(
        np.asarray(params["diffusion"]["norm"]["scale"]),
        np.asarray(state.params["diffusion"]["norm"]["scale"]))
    # the normalizer affine persists in checkpoints even though untrained
    mask = checkpoint_mask(params, cfg)
    assert all(jax.tree_util.tree_leaves(mask["diffusion"]["norm"]))


def test_fc_requires_window_folded_fusion():
    with pytest.raises(NotImplementedError):
        init_deer(jax.random.PRNGKey(0), tiny_cfg("fc"))


def test_scan_engine_rejects_alt_heads():
    from deer_vla_tpu.eval.scan_policy import check_serving_supported
    with pytest.raises(NotImplementedError):
        check_serving_supported(tiny_cfg("gpt"))
    check_serving_supported(tiny_cfg("gpt"), allow_any_head=True)


def _policy_inputs(cfg, seed=0):
    r = np.random.RandomState(seed)
    hw, s = cfg.vit.image_size, cfg.text_len
    img = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    grip = jnp.asarray(r.randn(1, 1, 1, 3, hw, hw), jnp.float32)
    ids = np.full((1, s), 7, np.int32)
    ids[0, 0] = cfg.media_token_id
    return img, grip, jnp.asarray(ids), jnp.ones((1, s), jnp.int32)


def test_gpt_head_serves_dynamic_exit():
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    cfg = tiny_cfg("gpt")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    ctrl = ExitController(exit_id_list=list(cfg.all_exit_ids()),
                          max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: 1e8 for e in cfg.all_exit_ids()})
    pol = DeerPolicy(params, cfg, controller=ctrl)
    img, grip, ids, mask = _policy_inputs(cfg)
    a1 = pol.step(img, grip, ids, mask)
    a2 = pol.step(img, grip, ids, mask)
    assert a1.shape == (7,) and np.all(np.isfinite(a1))
    assert pol.last_exit_layer == cfg.all_exit_ids()[0]  # huge thresholds
    # the GPT history carry advanced between steps (per-stream (B,)
    # counts since the batched-lane redesign; B=1 here)
    assert int(np.asarray(pol.carry.count)[0]) == 2
    assert np.all(np.isfinite(a2))


@pytest.mark.parametrize("head_type,kw,th", [
    ("gpt", {}, [0.05, 1e8]),        # data-dependent exit
    ("gpt", {}, [-1.0, 1e8]),        # full depth
    ("fc", {"fusion_mode": "vit_concat"}, [-1.0, 1e8]),
    ("diffusion", {}, [-1.0, 1e8]),
])
def test_scan_engine_matches_bucketed_per_head(head_type, kw, th):
    """Alt heads through the while-loop engine (any_head_step traced into
    the single program): exits and outputs must match the host-bucketed
    engine step for step, carries threading independently in each."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    cfg = tiny_cfg(head_type, **kw)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    exits = list(cfg.all_exit_ids())

    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    bucketed = DeerPolicy(params, cfg, controller=ctrl)
    scan = ScanDeerPolicy(params, cfg, thresholds=list(th))

    enc_w = cfg.window_size if cfg.fusion_mode == "vit_concat" else 1
    hw, s = cfg.vit.image_size, cfg.text_len
    for t in range(3):
        r = np.random.RandomState(100 + t)
        img = jnp.asarray(r.randn(enc_w, 1, 1, 3, hw, hw), jnp.float32)
        grip = jnp.asarray(r.randn(enc_w, 1, 1, 3, hw, hw), jnp.float32)
        ids = np.full((1, s), 7, np.int32)
        ids[0, 0] = cfg.media_token_id
        ids = jnp.asarray(ids)
        mask = jnp.ones((1, s), jnp.int32)
        bucketed.set_timestep(t)
        a_b = bucketed.step(img, grip, ids, mask)
        a_s = scan.step(img, grip, ids, mask)
        assert scan.last_exit_layer == bucketed.last_exit_layer, \
            f"step {t}: scan {scan.last_exit_layer} vs " \
            f"{bucketed.last_exit_layer}"
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_b),
                                   rtol=2e-4, atol=2e-4)
    if head_type == "gpt":
        assert int(np.asarray(scan.carry.count)[0]) == 3  # advanced per step


def test_diffusion_scan_engine_through_sampler():
    """DiffusionSamplerPolicy over the while-loop engine: identical plans
    to the bucketed-engine path (same features -> same DDPM sample)."""
    from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    cfg = tiny_cfg("diffusion")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    th = [-1.0, 1e8]
    pol_b = DiffusionSamplerPolicy(
        DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1), params, seed=0)
    scan = ScanDeerPolicy(params, cfg, thresholds=list(th))
    pol_s = DiffusionSamplerPolicy(scan, params, seed=0)
    img, grip, ids, mask = _policy_inputs(cfg)
    plan_b = pol_b.step(img, grip, ids, mask)
    plan_s = pol_s.step(img, grip, ids, mask)
    np.testing.assert_allclose(plan_s, plan_b, rtol=2e-4, atol=2e-4)


def test_diffusion_sampler_policy_plans():
    from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
    from deer_vla_tpu.eval.policy import DeerPolicy
    cfg = tiny_cfg("diffusion")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1)
    spol = DiffusionSamplerPolicy(pol, params, seed=0)
    img, grip, ids, mask = _policy_inputs(cfg)
    plan = spol.step(img, grip, ids, mask)
    # horizon 4, hist 1 -> 3 future actions
    assert plan.shape == (cfg.diff_horizon - (cfg.n_obs_steps - 1), 7)
    assert np.all(np.isfinite(plan))
    assert set(np.unique(plan[:, -1])) <= {-1.0, 1.0}  # binarized gripper
    # executed actions entered the history queue
    np.testing.assert_array_equal(np.stack(list(spol._hist))[-1], plan[-1])
    # future_act_len truncation (eval_calvin.py:209)
    spol2 = DiffusionSamplerPolicy(pol, params, future_act_len=2, seed=0)
    spol2.reset()
    assert spol2.step(img, grip, ids, mask).shape == (2, 7)


def test_diffusion_ddim_sampler_policy():
    """--diff_steps: the DDIM fast path emits plans with the same shape and
    contract as the full DDPM chain, in `sample_steps` U-Net evals."""
    from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
    from deer_vla_tpu.eval.policy import DeerPolicy
    cfg = tiny_cfg("diffusion")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    pol = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1)
    fast = DiffusionSamplerPolicy(pol, params, seed=0, sample_steps=3)
    img, grip, ids, mask = _policy_inputs(cfg)
    plan = fast.step(img, grip, ids, mask)
    assert plan.shape == (cfg.diff_horizon - (cfg.n_obs_steps - 1), 7)
    assert np.all(np.isfinite(plan))
    assert set(np.unique(plan[:, -1])) <= {-1.0, 1.0}
    # deterministic given the seed (eta=0 ODE limit, same rng stream)
    pol2 = DeerPolicy(params, cfg, exit_id=cfg.n_layers - 1)
    fast2 = DiffusionSamplerPolicy(pol2, params, seed=0, sample_steps=3)
    np.testing.assert_allclose(fast2.step(img, grip, ids, mask), plan,
                               rtol=2e-4, atol=2e-4)


def test_diffusion_exit_criterion_on_features():
    """Dynamic exit with the diffusion head compares conditioning features
    (models/heads.py doc) — the delta path must run without HeadOutput."""
    from deer_vla_tpu.eval.diffusion_policy import DiffusionSamplerPolicy
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.models.value_net import ExitController
    cfg = tiny_cfg("diffusion")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    ctrl = ExitController(exit_id_list=list(cfg.all_exit_ids()),
                          max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: 1e8 for e in cfg.all_exit_ids()})
    pol = DiffusionSamplerPolicy(DeerPolicy(params, cfg, controller=ctrl),
                                 params, seed=0)
    img, grip, ids, mask = _policy_inputs(cfg)
    plan = pol.step(img, grip, ids, mask)
    assert np.all(np.isfinite(plan))
    assert pol.last_exit_layer == cfg.all_exit_ids()[0]


def test_fit_action_normalizer():
    from deer_vla_tpu.train.trainer import fit_action_normalizer
    cfg = tiny_cfg("diffusion")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    loader = [{"actions": r.randn(2, 4, 7).astype(np.float32) * 3 + 1}
              for _ in range(3)]
    out = fit_action_normalizer(params, loader)
    scale = np.asarray(out["diffusion"]["norm"]["scale"])
    offset = np.asarray(out["diffusion"]["norm"]["offset"])
    assert not np.allclose(scale, 1.0)
    # limits mode maps the observed range onto [-1, 1]
    a = np.concatenate([b["actions"].reshape(-1, 7) for b in loader])
    z = a * scale + offset
    np.testing.assert_allclose(z.min(0), -1.0, atol=1e-5)
    np.testing.assert_allclose(z.max(0), 1.0, atol=1e-5)
    # original params untouched (pure update)
    np.testing.assert_array_equal(
        np.asarray(params["diffusion"]["norm"]["scale"]), 1.0)


def test_calibration_deltas_route_by_head_type():
    from deer_vla_tpu.eval.calibrate import generate_calibration_values
    cfg = tiny_cfg("gpt")
    params = init_deer(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    hw, w = cfg.vit.image_size, cfg.window_size
    batch = {
        "rgb_static": (r.rand(2, w, hw, hw, 3) * 255).astype(np.uint8),
        "rgb_gripper": (r.rand(2, w, hw, hw, 3) * 255).astype(np.uint8),
        "input_ids": np.full((2, cfg.text_len), 7, np.int64),
        "attention_mask": np.ones((2, cfg.text_len), np.int64),
    }
    batch["input_ids"][:, 0] = cfg.media_token_id
    vals = generate_calibration_values(params, cfg, [batch])
    # one delta row per exit (consecutive pairs over [0] + exit_list)
    assert vals.shape[0] == cfg.num_exits
    assert np.all(np.isfinite(vals))
