"""Trainer: two-phase loop, loss decrease, checkpoint save/resume, freeze
semantics."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import deer_tiny
from deer_vla_tpu.data.debug_data import DebugBatcher
from deer_vla_tpu.data.text import HashTokenizer
from deer_vla_tpu.models.flamingo import init_deer
from deer_vla_tpu.train.trainer import TrainConfig, Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              eoc_token_id=tok.eoc_token_id)
    loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=3,
                          img_hw=cfg.vit.image_size, grip_hw=cfg.vit.image_size)
    run_dir = str(tmp_path_factory.mktemp("run"))
    tcfg = TrainConfig(run_dir=run_dir, num_joint_epochs=1, num_exit_epochs=1,
                       joint_lr=1e-3, exit_lr=1e-3, joint_warmup_steps=0,
                       exit_warmup_steps=0, rgb_pad=2, gripper_pad=2,
                       logging_steps=1, batch_size=2)
    return cfg, tcfg, loader


def test_two_phase_training_runs(setup):
    cfg, tcfg, loader = setup
    logs = []
    tr = Trainer(cfg, tcfg, loader, log_fn=logs.append)
    p0 = jax.tree_util.tree_map(np.asarray, tr.params)
    metrics = tr.train()
    assert np.isfinite(metrics["loss"])
    phases = {l.get("phase") for l in logs}
    assert phases == {"joint", "exit_only"}

    p1 = tr.params
    # heads must have moved
    d_head = np.max(np.abs(np.asarray(p1["extra_exit"]["rnn"]["layers"][0]["wi"])
                           - p0["extra_exit"]["rnn"]["layers"][0]["wi"]))
    assert d_head > 0
    # frozen ViT must be untouched
    d_vit = np.max(np.abs(np.asarray(p1["vit"]["blocks"][0]["qkv"]["w"])
                          - p0["vit"]["blocks"][0]["qkv"]["w"]))
    assert d_vit == 0
    # frozen MPT block weights untouched (only xattn/embeddings train)
    d_blk = np.max(np.abs(np.asarray(p1["decoder"]["blocks"][0]["wqkv"]["w"])
                          - p0["decoder"]["blocks"][0]["wqkv"]["w"]))
    assert d_blk == 0
    # xattn moved during joint phase
    d_x = np.max(np.abs(np.asarray(p1["decoder"]["xattn"][0]["to_q"]["w"])
                        - p0["decoder"]["xattn"][0]["to_q"]["w"]))
    assert d_x > 0
    # checkpoints exist
    assert any(f.endswith(".ckpt") for f in os.listdir(tcfg.run_dir))


def test_checkpoint_resume(setup):
    cfg, tcfg, loader = setup
    tr2 = Trainer(cfg, tcfg, loader)
    start = tr2.maybe_resume()
    assert start == 2  # both epochs saved by previous test
    # delta checkpoint only stores trainable leaves; frozen ViT re-inits,
    # heads come from disk
    tr3 = Trainer(cfg, tcfg, loader)
    heads_before = np.asarray(tr3.params["lm_head"]["rnn"]["layers"][0]["wi"])
    tr3.maybe_resume()
    heads_after = np.asarray(tr3.params["lm_head"]["rnn"]["layers"][0]["wi"])
    assert not np.allclose(heads_before, heads_after)


def test_exit_only_loss_uses_stop_gradient(setup):
    """In the exit-only phase the backbone gets exactly zero gradient."""
    cfg, tcfg, loader = setup
    from deer_vla_tpu.models.flamingo import forward_train
    from deer_vla_tpu.train.losses import multi_exit_loss
    from deer_vla_tpu.train.trainer import prepare_batch

    params = init_deer(jax.random.PRNGKey(0), cfg)
    raw = next(iter(loader))
    batch = prepare_batch(raw, cfg, jax.random.PRNGKey(1), tcfg)

    def loss_fn(p):
        out = forward_train(p, batch["image"], batch["input_ids"],
                            batch["attention_mask"], cfg, jax.random.PRNGKey(2),
                            vision_gripper=batch["gripper"],
                            no_backbone_grad=True, train=False)
        return multi_exit_loss(out, batch["labels"])[0]

    grads = jax.grad(loss_fn)(params)
    g_backbone = np.max(np.abs(np.asarray(grads["decoder"]["blocks"][0]["wqkv"]["w"])))
    g_head = np.max(np.abs(np.asarray(grads["extra_exit"]["rnn"]["layers"][0]["wi"])))
    assert g_backbone == 0.0
    assert g_head > 0.0


def test_resume_restores_opt_state(setup, tmp_path):
    """Preemption resume must restore Adam moments + schedule count, not
    just params (train_calvin_post_strategy.py:589-629 parity)."""
    import jax.numpy as jnp
    cfg, tcfg0, loader = setup
    tcfg = dataclasses.replace(tcfg0, run_dir=str(tmp_path),
                               num_joint_epochs=2, num_exit_epochs=0)
    tr = Trainer(cfg, tcfg, loader)
    tr.train(num_epochs=1)  # 3 optimizer steps, ckpt deer_0 with opt_state

    def counts(opt_state):
        return {int(x) for x in jax.tree_util.tree_leaves(opt_state)
                if hasattr(x, "dtype") and x.dtype == jnp.int32 and x.ndim == 0}

    tr2 = Trainer(cfg, tcfg, loader)
    assert tr2.maybe_resume() == 1
    tr2.train(num_epochs=2)  # resumed joint epoch: restore branch fires
    # 3 restored + 3 new steps -> schedule/Adam count reaches 6
    assert 6 in counts(tr2.state.opt_state)


def test_multi_step_action_loss(setup):
    """multi_step_action k>1: flat (B, W, 6k)/(B, W, k) head outputs line up
    with (B, W, k, 7) collated labels inside multi_exit_loss."""
    import jax.numpy as jnp
    from deer_vla_tpu.models.flamingo import forward_train
    from deer_vla_tpu.train.losses import multi_exit_loss
    cfg0, tcfg, loader = setup
    cfg = dataclasses.replace(
        cfg0, head=dataclasses.replace(cfg0.head, multi_step_action=2))
    params = init_deer(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    bs, w, s = 2, cfg.window_size, cfg.text_len
    ids = np.full((bs * w, s), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    img = jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32)
    out = forward_train(params, img, jnp.asarray(ids),
                        jnp.ones((bs * w, s), jnp.int32), cfg,
                        jax.random.PRNGKey(1), vision_gripper=img, train=False)
    assert out.final_output.actions.shape == (bs, w, 12)
    assert out.final_output.gripper_logits.shape == (bs, w, 2)
    labels = jnp.asarray(np.clip(r.randn(bs, w, 2, 7), -1, 1), jnp.float32)
    labels = labels.at[..., 6].set(np.sign(np.asarray(labels[..., 6])))
    loss, m = multi_exit_loss(out, labels)
    assert np.isfinite(float(loss))
    assert m["per_exit_loss"].shape[0] == len(cfg.exit_layer_ids()) + 3

def test_debug_batcher_multi_step_shapes(setup):
    """Regression: DebugBatcher must emit (B, W, k, 7) labels for k>1 like
    the real collation (data/calvin.py; reference data.py:796-812) — it used
    to emit (B, W, 7) and crash the loss with a 6k-vs-6 broadcast."""
    from deer_vla_tpu.data.debug_data import DebugBatcher
    from deer_vla_tpu.data.text import HashTokenizer
    cfg0, tcfg, _ = setup
    cfg = dataclasses.replace(
        cfg0, head=dataclasses.replace(cfg0.head, multi_step_action=3))
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    batch = next(iter(DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                                   img_hw=cfg.vit.image_size,
                                   grip_hw=cfg.vit.image_size)))
    w = cfg.window_size
    assert batch["actions"].shape == (2, w, 3, 7)
    assert batch["rgb_static"].shape[1] == w
    # gripper channel stays in {-1, +1} after the window restack
    assert set(np.unique(batch["actions"][..., 6])) <= {-1.0, 1.0}
    # window slices overlap: label t, step j+1 == label t+1, step j
    assert np.allclose(batch["actions"][:, 0, 1], batch["actions"][:, 1, 0])


def test_save_every_iter(tmp_path):
    """save_every_iter > 0 writes a mid-epoch checkpoint before the epoch
    completes (train_utils.py:626-628 equivalent)."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              eoc_token_id=tok.eoc_token_id)
    loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=3,
                          img_hw=cfg.vit.image_size,
                          grip_hw=cfg.vit.image_size)
    tcfg = TrainConfig(run_dir=str(tmp_path), num_joint_epochs=1,
                       num_exit_epochs=0, joint_lr=1e-3, exit_lr=1e-3,
                       joint_warmup_steps=0, exit_warmup_steps=0,
                       rgb_pad=2, gripper_pad=2, logging_steps=100,
                       batch_size=2, save_every_epoch=False,
                       save_every_iter=2)
    tr = Trainer(cfg, tcfg, loader)
    tr.train()
    # 3 batches with save_every_iter=2 -> one mid-epoch save exists even
    # though save_every_epoch is off
    ckpts = [f for f in os.listdir(tmp_path) if f.startswith("deer_")]
    assert ckpts, os.listdir(tmp_path)

def test_unconsumed_key_diagnostic(tmp_path):
    """Checkpoint keys with no home in the template are surfaced in meta +
    a warning (check_loaded_parameters equivalent, eval_utils.py:129-141)."""
    import warnings
    import jax.numpy as jnp
    from deer_vla_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint)
    cfg = deer_tiny()
    params = {"a": {"w": jnp.ones((2, 2))}, "b": jnp.zeros((3,))}
    p = str(tmp_path / "ck")
    save_checkpoint(p, params, cfg, meta={})
    template = {"a": {"w": jnp.zeros((2, 2))}}  # "b" has no home
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        loaded, _, meta = load_checkpoint(p, template)
    assert meta["meta"]["loaded_keys"] == 1
    assert meta["meta"]["unconsumed_keys"] == ["b"]
    assert any("not matched" in str(w.message) for w in rec)
    np.testing.assert_allclose(np.asarray(loaded["a"]["w"]), 1.0)

def test_mid_epoch_resume_reruns_epoch(tmp_path):
    """A deer_{E}_it{N} checkpoint resumes AT epoch E (re-running it), and
    an end-of-epoch deer_{E} outranks same-epoch mid-epoch saves."""
    from deer_vla_tpu.train.checkpoint import (find_latest_checkpoint,
                                               save_checkpoint)
    import jax.numpy as jnp
    cfg = deer_tiny()
    p = {"a": jnp.zeros((2,))}
    save_checkpoint(str(tmp_path / "deer_3_it500"), p, cfg,
                    meta={"epoch": 3, "step": 500, "phase": "joint"})
    ck = find_latest_checkpoint(str(tmp_path))
    assert ck.endswith("deer_3_it500.ckpt")
    # end-of-epoch 3 outranks it
    save_checkpoint(str(tmp_path / "deer_3"), p, cfg,
                    meta={"epoch": 3, "phase": "joint"})
    assert find_latest_checkpoint(str(tmp_path)).endswith("deer_3.ckpt")
    # later mid-epoch save of epoch 4 outranks epoch 3
    save_checkpoint(str(tmp_path / "deer_4_it2"), p, cfg,
                    meta={"epoch": 4, "step": 2, "phase": "exit_only"})
    assert find_latest_checkpoint(str(tmp_path)).endswith("deer_4_it2.ckpt")

    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg2 = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                               eoc_token_id=tok.eoc_token_id)
    loader = DebugBatcher(cfg2, tok, batch_size=2, num_batches=1,
                          img_hw=cfg2.vit.image_size,
                          grip_hw=cfg2.vit.image_size)
    run2 = tmp_path / "mid_only"
    run2.mkdir()
    params = init_deer(jax.random.PRNGKey(0), cfg2)
    save_checkpoint(str(run2 / "deer_1_it7"), params, cfg2,
                    meta={"epoch": 1, "step": 7, "phase": "joint"})
    tcfg = TrainConfig(run_dir=str(run2), num_joint_epochs=2,
                       num_exit_epochs=0, joint_lr=1e-3, exit_lr=1e-3,
                       joint_warmup_steps=0, exit_warmup_steps=0,
                       rgb_pad=2, gripper_pad=2, batch_size=2)
    tr = Trainer(cfg2, tcfg, loader)
    assert tr.maybe_resume() == 1  # re-run epoch 1, don't skip to 2

def test_clip_state(tmp_path):
    """--clip_state keeps arm6+gripper of the proprio vector end to end:
    state_fc is built for 7 dims and prepare_batch clips."""
    from deer_vla_tpu.cli.train import main
    main(["--debug", "--model", "tiny", "--use_state", "--clip_state",
          "--num_joint_epochs", "1", "--num_exit_epochs", "0",
          "--batch_size_calvin", "2", "--run_name", str(tmp_path),
          "--precision", "fp32"])
    import json as _json
    side = _json.load(open(tmp_path / "deer_0.json"))
    assert side["config"]["clip_state"] is True
    assert side["config"]["state_dim"] == 7


def test_freeze_policy_knobs(setup):
    """Reference factory.py:203-237 ablation flags: freeze_embed,
    freeze_sampler, unfreeze_vit, train_params last-K x-attn budget."""
    from deer_vla_tpu.models.flamingo import trainable_mask
    cfg, _, _ = setup
    params = init_deer(jax.random.PRNGKey(0), cfg)

    def leaves_true(mask_subtree):
        return all(jax.tree_util.tree_leaves(mask_subtree))

    def leaves_false(mask_subtree):
        return not any(jax.tree_util.tree_leaves(mask_subtree))

    base = trainable_mask(params, cfg, "joint")
    assert leaves_false(base["vit"])
    assert leaves_true(base["perceiver"])
    assert leaves_true(base["decoder"]["wte"])
    assert leaves_true(base["decoder"]["xattn"])

    m = trainable_mask(params, dataclasses.replace(cfg, freeze_embed=True),
                       "joint")
    assert leaves_false(m["decoder"]["wte"])
    assert leaves_true(m["decoder"]["xattn"])  # rest untouched

    m = trainable_mask(params, dataclasses.replace(cfg, freeze_sampler=True),
                       "joint")
    assert leaves_false(m["perceiver"])

    cfg_vit = dataclasses.replace(cfg, unfreeze_vit=True)
    m = trainable_mask(params, cfg_vit, "joint")
    assert leaves_true(m["vit"])
    # exit_only still freezes the backbone, ViT included
    assert leaves_false(trainable_mask(params, cfg_vit, "exit_only")["vit"])

    # tiny: xattn every layer -> 4 x-attn layers; 280/140 = last 2 train
    m = trainable_mask(params, dataclasses.replace(cfg, train_params=280),
                       "joint")
    xattn = m["decoder"]["xattn"]
    n = len(xattn)
    assert n >= 3
    assert leaves_false(xattn[0]) and leaves_false(xattn[n - 3])
    assert leaves_true(xattn[n - 2]) and leaves_true(xattn[n - 1])
    # budget 0: every x-attn layer frozen
    m = trainable_mask(params, dataclasses.replace(cfg, train_params=0),
                       "joint")
    assert leaves_false(m["decoder"]["xattn"])

    # budget EXCEEDING the x-attn layer count: trains ALL of them (the
    # reference's backwards walk clamps at the list head, factory.py:217-222;
    # the old slice wrapped negative and trained only the last layer)
    m = trainable_mask(params,
                       dataclasses.replace(cfg, train_params=140 * (n + 3)),
                       "joint")
    assert leaves_true(m["decoder"]["xattn"])

    # any train_params budget keeps the perceiver FROZEN (the reference
    # unfreezes it only in the train_params == -1 branch, factory.py:209-213)
    m = trainable_mask(params, dataclasses.replace(cfg, train_params=280),
                       "joint")
    assert leaves_false(m["perceiver"])


def test_trainer_eval_seed_contract(setup):
    """The sidecar's meta seed S must mean init_deer(PRNGKey(S)) — what
    cli/eval.load_model reconstructs before overlaying the trainable delta.
    (Regression: a split() in Trainer.__init__ trained every delta ckpt
    against a DIFFERENT random frozen backbone than eval rebuilds.)"""
    cfg, tcfg, loader = setup
    from deer_vla_tpu.models.flamingo import init_deer as _init
    tr = Trainer(cfg, tcfg, loader, log_fn=lambda *_: None)
    ref = _init(jax.random.PRNGKey(tcfg.seed), cfg)
    np.testing.assert_array_equal(
        np.asarray(tr.params["vit"]["blocks"][0]["qkv"]["w"]),
        np.asarray(ref["vit"]["blocks"][0]["qkv"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(tr.params["decoder"]["blocks"][0]["wqkv"]["w"]),
        np.asarray(ref["decoder"]["blocks"][0]["wqkv"]["w"]))


def test_ema_checkpoints(setup, tmp_path):
    """--ema_decay writes <name>_ema.ckpt siblings whose trainable leaves
    are the moving average (differ from the final params for decay near 1;
    frozen backbone identical); the EMA ckpt loads like any checkpoint."""
    cfg, tcfg, loader = setup
    t = dataclasses.replace(tcfg, num_joint_epochs=1, num_exit_epochs=0,
                            ema_decay=0.95, run_dir=str(tmp_path / "ema"))
    tr = Trainer(cfg, t, loader, log_fn=lambda *_: None)
    tr.train()
    assert os.path.exists(t.run_dir + "/deer_0.ckpt")
    assert os.path.exists(t.run_dir + "/deer_0_ema.ckpt")

    from deer_vla_tpu.train.checkpoint import load_checkpoint
    from deer_vla_tpu.models.flamingo import init_deer as _init
    template = _init(jax.random.PRNGKey(t.seed), cfg)
    p_reg, _, _ = load_checkpoint(t.run_dir + "/deer_0.ckpt", template)
    template = _init(jax.random.PRNGKey(t.seed), cfg)
    p_ema, _, _ = load_checkpoint(t.run_dir + "/deer_0_ema.ckpt", template)
    reg = np.asarray(p_reg["extra_exit"]["rnn"]["layers"][0]["wi"])
    ema = np.asarray(p_ema["extra_exit"]["rnn"]["layers"][0]["wi"])
    assert not np.allclose(reg, ema)  # decay .95 lags the live params
    assert np.isfinite(ema).all()
    # frozen backbone identical in both
    np.testing.assert_array_equal(
        np.asarray(p_reg["vit"]["blocks"][0]["qkv"]["w"]),
        np.asarray(p_ema["vit"]["blocks"][0]["qkv"]["w"]))
    # the EMA checkpoint resume-scan is not confused by the _ema suffix
    from deer_vla_tpu.train.checkpoint import find_latest_checkpoint
    assert find_latest_checkpoint(t.run_dir).endswith("deer_0.ckpt")


def test_unfreeze_vit_gradients_actually_flow(setup):
    """--unfreeze_vit must move the ViT weights (vision_tokens skips the
    stop_gradient); without it the ViT stays bit-identical.  The reference
    flag is silently dead — its _encode_vision always runs under
    torch.no_grad (flamingo_mpt.py:573)."""
    cfg, tcfg, loader = setup
    for unfreeze in (False, True):
        c = dataclasses.replace(cfg, unfreeze_vit=unfreeze)
        t = dataclasses.replace(tcfg, num_joint_epochs=1, num_exit_epochs=0,
                                run_dir=tcfg.run_dir + f"/uv{int(unfreeze)}")
        tr = Trainer(c, t, loader, log_fn=lambda *_: None)
        v0 = np.asarray(tr.params["vit"]["blocks"][0]["qkv"]["w"]).copy()
        tr.train()
        d = np.max(np.abs(np.asarray(
            tr.params["vit"]["blocks"][0]["qkv"]["w"]) - v0))
        if unfreeze:
            assert d > 0, "--unfreeze_vit did not move the ViT"
        else:
            assert d == 0


def test_save_freq_skips_epochs(tmp_path):
    """save_freq=3 over 4 joint epochs saves epochs 0 and 3 only
    (train_calvin_post_strategy.py:688; final epoch always saved)."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              eoc_token_id=tok.eoc_token_id)
    loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                          img_hw=cfg.vit.image_size,
                          grip_hw=cfg.vit.image_size)
    tcfg = TrainConfig(run_dir=str(tmp_path), num_joint_epochs=4,
                       num_exit_epochs=0, joint_lr=1e-3, exit_lr=1e-3,
                       joint_warmup_steps=0, exit_warmup_steps=0,
                       rgb_pad=2, gripper_pad=2, logging_steps=100,
                       batch_size=2, save_freq=3)
    Trainer(cfg, tcfg, loader).train()
    saved = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("deer_") and f.endswith(".ckpt"))
    assert saved == ["deer_0.ckpt", "deer_3.ckpt"], saved


def test_loss_multiplier_calvin_scales_gradient_not_metrics(tmp_path):
    """--loss_multiplier_calvin scales the backward loss
    (train_utils.py:322,549): the logged loss is post-multiplier like the
    reference, and the optimizer sees a scaled gradient so trained params
    differ."""
    cfg = deer_tiny()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=cfg.text_len)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id,
                              eoc_token_id=tok.eoc_token_id)

    def run(mult, sub):
        loader = DebugBatcher(cfg, tok, batch_size=2, num_batches=1,
                              img_hw=cfg.vit.image_size,
                              grip_hw=cfg.vit.image_size)
        tcfg = TrainConfig(run_dir=str(tmp_path / sub), num_joint_epochs=1,
                           num_exit_epochs=0, joint_lr=1e-3, exit_lr=1e-3,
                           joint_warmup_steps=0, exit_warmup_steps=0,
                           rgb_pad=2, gripper_pad=2, logging_steps=100,
                           batch_size=2, save_every_epoch=False,
                           seed=7, loss_multiplier_calvin=mult)
        tr = Trainer(cfg, tcfg, loader)
        m = tr.train()
        return m, tr.params

    m1, p1 = run(1.0, "m1")
    m2, p2 = run(2.0, "m2")
    # identical seed + data: the logged backward loss is exactly 2x
    # (the reference's logged loss_calvin is post-multiplier too)
    np.testing.assert_allclose(2.0 * m1["loss"], m2["loss"], rtol=1e-4)
    # but the optimizer saw a 2x gradient, so the trained heads differ
    d = np.max(np.abs(
        np.asarray(p1["extra_exit"]["rnn"]["layers"][0]["wi"])
        - np.asarray(p2["extra_exit"]["rnn"]["layers"][0]["wi"])))
    assert d > 0
