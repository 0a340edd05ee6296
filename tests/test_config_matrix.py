"""Config-combination robustness net: seeded sweep of VALID tiny-config
combinations through init_deer -> forward_train -> multi-exit loss.  The
axes interact (fusion folding x heads x state x multi-step x exit layout)
and individual features are tested in isolation elsewhere; this catches
cross-feature crashes (shape folds, head routing, media token counts)."""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.models.flamingo import forward_train, init_deer
from deer_vla_tpu.train.losses import multi_exit_loss

AXES = {
    "fusion_mode": ["post", "pre", "two_way", "vit_concat"],
    "use_hist": [False, True],
    "use_state": [False, True],
    "sep_resampler": [False, True],
    "share_exit": [False, True],
    "head_type": ["deterministic", "gpt"],
    "multi_step_action": [1, 2],
    "exit_interval": [1, 2],
}


def _valid(c):
    # use_hist rides on post fusion with frame embeddings; vit_concat folds
    # the window itself — combining both is meaningless
    if c["use_hist"] and c["fusion_mode"] != "post":
        return False
    # the gpt head refuses proprio by design (the reference GPTDecoder takes
    # no state argument; init_deer raises loudly — models/heads.py)
    if c["head_type"] == "gpt" and c["use_state"]:
        return False
    return True


def _combos(n=14, seed=0):
    keys = sorted(AXES)
    all_c = [dict(zip(keys, v))
             for v in itertools.product(*(AXES[k] for k in keys))]
    all_c = [c for c in all_c if _valid(c)]
    r = np.random.RandomState(seed)
    idx = r.choice(len(all_c), size=n, replace=False)
    return [all_c[i] for i in sorted(idx)]


_DEFAULTS = {"fusion_mode": "post", "use_hist": False, "use_state": False,
             "sep_resampler": False, "share_exit": False,
             "head_type": "deterministic", "multi_step_action": 1,
             "exit_interval": 1}


@pytest.mark.parametrize("combo", _combos(),
                         ids=lambda c: "-".join(
                             f"{k}={v}" for k, v in sorted(c.items())
                             if v is not _DEFAULTS[k] and v != _DEFAULTS[k]))
def test_config_combo_trains(combo):
    cfg = deer_tiny(exit_interval=combo["exit_interval"], window_size=2)
    head = dataclasses.replace(cfg.head,
                               multi_step_action=combo["multi_step_action"],
                               use_state=combo["use_state"])
    cfg = dataclasses.replace(
        cfg, head=head, fusion_mode=combo["fusion_mode"],
        use_hist=combo["use_hist"], use_state=combo["use_state"],
        sep_resampler=combo["sep_resampler"], share_exit=combo["share_exit"],
        head_type=combo["head_type"])
    params = init_deer(jax.random.PRNGKey(0), cfg)

    b, w, hw, s = 2, cfg.window_size, cfg.vit.image_size, cfg.text_len
    k = combo["multi_step_action"]
    r = np.random.RandomState(1)
    # vit_concat folds the window into media: text rows are PER-TRAJECTORY
    # (forward_train docstring / train_utils.py:240-251); all other modes
    # take per-frame rows
    rows = b if combo["fusion_mode"] == "vit_concat" else b * w
    ids = np.full((rows, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    # (B*W, 1, 1, state_dim) — the loader's per-frame proprio layout
    # (forward_train docstring)
    state = (jnp.asarray(r.randn(b * w, 1, 1, cfg.state_dim), jnp.float32)
             if combo["use_state"] else None)
    out = forward_train(
        params,
        jnp.asarray(r.randn(b * w, 1, 1, 3, hw, hw), jnp.float32),
        jnp.asarray(ids), jnp.ones((rows, s), jnp.int32), cfg,
        vision_gripper=jnp.asarray(r.randn(b * w, 1, 1, 3, hw, hw),
                                   jnp.float32),
        state_tensor=state, rng=jax.random.PRNGKey(2))
    # collation layout: (B, W, 7), or (B, W, k, 7) for multi_step_action
    shape = (b, w, 7) if k == 1 else (b, w, k, 7)
    labels = jnp.asarray(np.clip(r.randn(*shape), -1, 1), jnp.float32)
    loss, parts = multi_exit_loss(
        out, labels,
        last_step_only=(cfg.fusion_mode == "vit_concat" or cfg.use_hist))
    assert np.isfinite(float(loss)), combo


# -- serving cross: while-loop engine == bucketed engine per combo ----------

SERVE_AXES = {
    "fusion_mode": ["post", "vit_concat"],
    "use_hist": [False, True],
    "use_state": [False, True],
    "multi_step_action": [1, 2],
    "share_exit": [False, True],
}


def _serve_combos(n=6, seed=3):
    keys = sorted(SERVE_AXES)
    all_c = [dict(zip(keys, v))
             for v in itertools.product(*(SERVE_AXES[k] for k in keys))]
    all_c = [c for c in all_c
             if not (c["use_hist"] and c["fusion_mode"] != "post")]
    r = np.random.RandomState(seed)
    idx = r.choice(len(all_c), size=n, replace=False)
    return [all_c[i] for i in sorted(idx)]


@pytest.mark.parametrize("combo", _serve_combos(),
                         ids=lambda c: "-".join(
                             f"{k}={v}" for k, v in sorted(c.items())
                             if v != _DEFAULTS.get(k, None)))
def test_serving_engines_agree_per_combo(combo):
    """Cross-feature serving: the while-loop single program and the
    host-bucketed engine must pick the same exits and emit the same actions
    for every feature combination both serve."""
    from deer_vla_tpu.eval.policy import DeerPolicy
    from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
    from deer_vla_tpu.models.value_net import ExitController

    cfg = deer_tiny(window_size=2)
    head = dataclasses.replace(cfg.head,
                               multi_step_action=combo["multi_step_action"],
                               use_state=combo["use_state"])
    cfg = dataclasses.replace(
        cfg, head=head, fusion_mode=combo["fusion_mode"],
        use_hist=combo["use_hist"], use_state=combo["use_state"],
        share_exit=combo["share_exit"])
    params = init_deer(jax.random.PRNGKey(0), cfg)
    exits = list(cfg.all_exit_ids())
    th = [0.05] * (len(exits) - 1) + [1e8]

    ctrl = ExitController(exit_id_list=exits, max_layer=cfg.n_layers)
    ctrl.set_thresholds({e: t for e, t in zip(exits, th)})
    bucketed = DeerPolicy(params, cfg, controller=ctrl)
    scan = ScanDeerPolicy(params, cfg, thresholds=list(th))

    folded = cfg.fusion_mode == "vit_concat" or cfg.use_hist
    enc_w = cfg.window_size if folded else 1
    text_rows = 1
    hw, s = cfg.vit.image_size, cfg.text_len
    if cfg.use_hist:
        text_rows = enc_w  # per-frame text rows at serving
    for t in range(2):
        r = np.random.RandomState(50 + t)
        img = jnp.asarray(r.randn(enc_w, 1, 1, 3, hw, hw), jnp.float32)
        grip = jnp.asarray(r.randn(enc_w, 1, 1, 3, hw, hw), jnp.float32)
        ids = np.full((text_rows, s), 7, np.int32)
        ids[:, 0] = cfg.media_token_id
        ids = jnp.asarray(ids)
        mask = jnp.ones((text_rows, s), jnp.int32)
        st = (jnp.asarray(r.randn(enc_w, 1, 1, cfg.state_dim), jnp.float32)
              if combo["use_state"] else None)
        bucketed.set_timestep(t)
        a_b = bucketed.step(img, grip, ids, mask, state=st)
        a_s = scan.step(img, grip, ids, mask, state=st)
        assert scan.last_exit_layer == bucketed.last_exit_layer, combo
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_b),
                                   rtol=2e-4, atol=2e-4, err_msg=str(combo))
