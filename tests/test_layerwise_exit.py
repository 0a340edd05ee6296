"""layerwise_exit_eval: the chosen exit layer's OWN head (lm_exits[i] /
lm_head) produces the final action, each head streaming its own LSTM carry,
while the exit criterion stays on the shared extra exit
(eval_calvin.py:530,583; flamingo_mpt.py:450-457)."""

import dataclasses

import jax
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.eval.policy import DeerPolicy
from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter, DebugEnv
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.models.value_net import ExitController


@pytest.fixture(scope="module")
def tiny():
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size,
                        max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              layerwise_exit_eval=True)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    return cfg, params, tok


def test_layerwise_fixed_exit_uses_own_head(tiny):
    cfg, params, tok = tiny
    cfg_xx = dataclasses.replace(cfg, layerwise_exit_eval=False)
    pol_lw = DeerPolicy(params, cfg, exit_id=1)
    pol_xx = DeerPolicy(params, cfg_xx, exit_id=1)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    obs = env.get_obs()
    goal = "pick up the red block"
    ad_lw = CalvinPolicyAdapter(pol_lw, tok, text_len=cfg.text_len)
    ad_xx = CalvinPolicyAdapter(pol_xx, tok, text_len=cfg.text_len)
    a_lw = ad_lw.step(obs, goal)
    a_xx = ad_xx.step(obs, goal)
    # exit 1 is an internal exit: lm_exits["1"] vs extra_exit -> different
    # randomly initialized heads, different arm actions
    assert a_lw.shape == (7,)
    assert not np.allclose(a_lw[:6], a_xx[:6])
    # only the taken exit's head carry exists, and it streams across steps
    assert set(pol_lw.layer_carries) == {1}
    leaf0 = np.asarray(jax.tree_util.tree_leaves(pol_lw.layer_carries[1])[0])
    ad_lw.step(env.get_obs(), goal)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(pol_lw.layer_carries[1])[0])
    assert not np.allclose(leaf0, leaf1)
    # the criterion (extra-exit) carry is still committed exactly once/step
    assert pol_lw.carry is not None


def _dyn_policy(params, cfg, thresholds):
    ctrl = ExitController(exit_id_list=list(cfg.all_exit_ids()),
                          steps_per_stage=1, max_layer=cfg.n_layers)
    ctrl.set_threshold_values(thresholds)
    return DeerPolicy(params, cfg, controller=ctrl)


def test_layerwise_dynamic_exit_choice_unchanged(tiny):
    """Exit-layer decisions are identical to extra-exit serving (the
    criterion head is unchanged); only the action head differs."""
    cfg, params, tok = tiny
    cfg_xx = dataclasses.replace(cfg, layerwise_exit_eval=False)
    env = DebugEnv(img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    goal = "push the blue block"
    for th, want_exit in [([1e9, 1e9], 1), ([-1.0, 1e9], cfg.n_layers - 1)]:
        pol_lw = _dyn_policy(params, cfg, th)
        pol_xx = _dyn_policy(params, cfg_xx, th)
        ad_lw = CalvinPolicyAdapter(pol_lw, tok, text_len=cfg.text_len)
        ad_xx = CalvinPolicyAdapter(pol_xx, tok, text_len=cfg.text_len)
        for _ in range(3):
            obs = env.get_obs()
            a_lw = ad_lw.step(obs, goal)
            a_xx = ad_xx.step(obs, goal)
            assert pol_lw.last_exit_layer == pol_xx.last_exit_layer == want_exit
            assert not np.allclose(a_lw[:6], a_xx[:6])
        # per-head carries: exactly the taken exit's head streamed
        assert set(pol_lw.layer_carries) == {want_exit}


def test_train_cli_config_plumbing():
    """--no_gripper / --from_scratch reach the config / resume logic."""
    from deer_vla_tpu.cli.train import build_parser, make_model_config
    args = build_parser().parse_args(
        ["--model", "tiny", "--no_gripper", "--from_scratch"])
    cfg = make_model_config(args)
    assert cfg.use_gripper is False
    assert args.from_scratch is True
    cfg2 = make_model_config(build_parser().parse_args(["--model", "tiny"]))
    assert cfg2.use_gripper is True


def test_cli_layerwise_smoke(tmp_path):
    """Full CLI path: train a tiny multi-exit ckpt, eval layerwise."""
    from deer_vla_tpu.cli.eval import main as eval_main
    from deer_vla_tpu.cli.train import main as train_main
    run = str(tmp_path / "run")
    train_main([
        "--debug", "--model", "tiny", "--num_joint_epochs", "1",
        "--num_exit_epochs", "0", "--batch_size_calvin", "2",
        "--precision", "fp32", "--run_name", run])
    report = eval_main([
        "--debug", "--evaluate_from_checkpoint", run + "/deer_0.ckpt",
        "--precision", "fp32", "--num_sequences_override", "2",
        "--exit_ratio", "1.0", "--calib_batches", "1",
        "--layerwise_exit_eval"])
    assert np.isfinite(report["avg_seq_len"])
    assert report["avg_exit_layer"] > 0
