"""Llama-variant decoder (BCFlamingo path): block math + full forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import MPTConfig, deer_tiny


def tiny_llama_cfg():
    cfg = deer_tiny()
    mpt = dataclasses.replace(cfg.mpt, arch="llama", alibi=False)
    return dataclasses.replace(cfg, mpt=mpt, multi_exit=False)


def test_rmsnorm_matches_torch():
    torch = pytest.importorskip("torch")
    from deer_vla_tpu.models.llama import init_rmsnorm, rmsnorm
    d = 16
    p = {"scale": jnp.asarray(np.random.RandomState(0).randn(d), jnp.float32)}
    x = np.random.RandomState(1).randn(3, d).astype(np.float32)
    y = rmsnorm(p, jnp.asarray(x), eps=1e-5)
    xt = torch.from_numpy(x)
    ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5) \
        * torch.from_numpy(np.asarray(p["scale"]))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_rope_rotation_properties():
    from deer_vla_tpu.models.llama import apply_rope, rope_tables
    cos, sin = rope_tables(8, 16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 8, 16), jnp.float32)
    y = apply_rope(x, cos, sin)
    # norm-preserving per pair
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y[:, :, 0]), np.asarray(x[:, :, 0]),
                               rtol=1e-6, atol=1e-6)
    # relative property: <rope(q)_i, rope(k)_j> depends only on i-j
    q = jnp.asarray(np.random.RandomState(1).randn(1, 1, 8, 16), jnp.float32)
    k = jnp.asarray(np.random.RandomState(2).randn(1, 1, 8, 16), jnp.float32)
    qq = np.asarray(apply_rope(jnp.broadcast_to(q[:, :, :1], q.shape), cos, sin))
    kk = np.asarray(apply_rope(jnp.broadcast_to(k[:, :, :1], k.shape), cos, sin))
    dots = np.einsum("bhid,bhjd->ij", qq, kk)
    np.testing.assert_allclose(np.diag(dots, 1), np.diag(dots, 1)[0] *
                               np.ones(7), rtol=1e-4)


def test_bc_flamingo_forward():
    from deer_vla_tpu.models.flamingo import forward_fixed_exit, forward_train, init_deer
    cfg = tiny_llama_cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    assert params["lm_exits"] == {}
    r = np.random.RandomState(0)
    bs, w = 2, cfg.window_size
    img = jnp.asarray(r.randn(bs * w, 1, 1, 3, 28, 28), jnp.float32)
    ids = np.full((bs * w, cfg.text_len), 7, np.int32)
    ids[:, 0] = cfg.media_token_id
    mask = jnp.ones((bs * w, cfg.text_len), jnp.int32)
    out = forward_train(params, img, jnp.asarray(ids), mask, cfg,
                        jax.random.PRNGKey(1), vision_gripper=img, train=False)
    assert out.exit_outputs == ()
    assert out.final_output.actions.shape == (bs, w, 6)
    assert np.all(np.isfinite(np.asarray(out.final_output.actions)))

    # loss path works without internal exits
    from deer_vla_tpu.train.losses import multi_exit_loss
    labels = jnp.asarray(np.clip(r.randn(bs, w, 7), -1, 1), jnp.float32)
    loss, m = multi_exit_loss(out, labels)
    assert np.isfinite(float(loss))
    assert m["per_exit_loss"].shape == (3,)  # final + extra1 + extra2

    # streaming final-layer inference
    o, carry = forward_fixed_exit(params, img[:1], jnp.asarray(ids[:1]),
                                  mask[:1], cfg, exit_id=-1,
                                  vision_gripper=img[:1])
    assert o.actions.shape == (1, 1, 6)


def test_llama_generate_and_lm_loss():
    """BCFlamingo.generate equivalent for the llama family
    (flamingo_bc.py:252-310): greedy text generation + LM loss run through
    the UNTIED llama head (rmsnorm(norm_f) + lm_head, lm_logits' llama
    branch)."""
    from deer_vla_tpu.data.text import HashTokenizer
    from deer_vla_tpu.eval.vl_eval import greedy_generate
    from deer_vla_tpu.models.flamingo import init_deer
    from deer_vla_tpu.models.mpt import lm_logits

    cfg = tiny_llama_cfg()
    tok = HashTokenizer(vocab_size=cfg.mpt.vocab_size, max_length=8)
    cfg = dataclasses.replace(cfg, media_token_id=tok.media_token_id)
    params = init_deer(jax.random.PRNGKey(0), cfg)
    assert "norm_f" in params["decoder"] and "lm_head_w" in params["decoder"]

    r = np.random.RandomState(0)
    vis = jnp.asarray(r.randn(2, 1, 1, 3, 28, 28), jnp.float32)
    ids, mask = tok(["open the drawer", "push the block"])
    out = greedy_generate(params, cfg, vis, np.asarray(ids)[:, :-2],
                          np.asarray(mask)[:, :-2], max_new_tokens=4,
                          eos_id=tok.eos_token_id)
    assert out.shape == (2, 4)
    assert np.all((out >= 0) & (out < cfg.mpt.vocab_size))

    # the llama branch actually differs from the tied-mpt branch
    h = jnp.asarray(r.randn(2, 8, cfg.mpt.d_model), jnp.float32)
    l_llama = lm_logits(params["decoder"], h, arch="llama")
    l_mpt = lm_logits(params["decoder"], h, arch="mpt")
    assert l_llama.shape == l_mpt.shape == (2, 8, cfg.mpt.vocab_size)
    assert not np.allclose(np.asarray(l_llama), np.asarray(l_mpt))

    # LM pretrain loss consumes the llama head too
    from deer_vla_tpu.train.pretrain import lm_loss
    loss, _ = lm_loss(params, cfg, vis, jnp.asarray(ids),
                      jnp.asarray(mask))
    assert np.isfinite(float(loss))


def test_llama_lm_head_trainable():
    """Regression: the untied llama LM head must be TRAINABLE in the joint
    phase (a frozen random lm_head makes LM pretraining learn nothing)."""
    from deer_vla_tpu.models.flamingo import init_deer, trainable_mask
    cfg = tiny_llama_cfg()
    params = init_deer(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, cfg, "joint")
    assert bool(jax.tree_util.tree_leaves(mask["decoder"]["lm_head_w"])[0])
    assert bool(jax.tree_util.tree_leaves(mask["decoder"]["norm_f"])[0])
    assert bool(jax.tree_util.tree_leaves(mask["decoder"]["wte"])[0])
