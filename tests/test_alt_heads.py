"""FCDecoder, GPTDecoder, diffusion head, and normalizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deer_vla_tpu.core.config import HeadConfig


def small_head_cfg(**kw):
    base = dict(in_features=16, hidden_size=12, lstm_num_layers=2,
                mlp_hidden_dims=(8, 6), mlp_num_hidden_layers=2, window_size=4)
    base.update(kw)
    return HeadConfig(**base)


def test_fc_decoder():
    from deer_vla_tpu.models.alt_heads import fc_decoder_forward, init_fc_decoder
    cfg = small_head_cfg()
    p = init_fc_decoder(jax.random.PRNGKey(0), cfg)
    feat = jnp.asarray(np.random.RandomState(0).randn(8, 5, 16), jnp.float32)
    out = fc_decoder_forward(p, feat, cfg)
    assert out.actions.shape == (2, 4, 6)
    assert np.all(np.abs(np.asarray(out.actions)) <= 1.0)
    assert np.all((np.asarray(out.gripper_probs) >= 0)
                  & (np.asarray(out.gripper_probs) <= 1))


def test_gpt_decoder_window_and_stream():
    from deer_vla_tpu.models.alt_heads import (GPTDecoderConfig,
                                               gpt_decoder_forward,
                                               gpt_decoder_step, gpt_zero_carry,
                                               init_gpt_decoder)
    cfg = GPTDecoderConfig(head=small_head_cfg(), n_layer=2, n_head=2)
    p = init_gpt_decoder(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(1)
    feat = jnp.asarray(r.randn(2 * 4, 5, 16), jnp.float32)
    out = gpt_decoder_forward(p, feat, cfg)
    assert out.actions.shape == (2, 4, 6)

    # streaming parity with window mode at the final step
    fb = feat.reshape(2, 4, 5, 16)
    carry = gpt_zero_carry(cfg, 2)
    for t in range(4):
        s_out, carry = gpt_decoder_step(p, fb[:, t], carry, cfg)
    np.testing.assert_allclose(np.asarray(s_out.actions[:, 0]),
                               np.asarray(out.actions[:, -1]),
                               rtol=2e-4, atol=2e-4)
    # rolling beyond history_len keeps working
    s_out2, carry = gpt_decoder_step(p, fb[:, 0], carry, cfg)
    assert np.all(np.isfinite(np.asarray(s_out2.actions)))


def test_normalizer_limits_and_gaussian():
    from deer_vla_tpu.models.normalizer import LinearNormalizer
    r = np.random.RandomState(0)
    data = r.randn(100, 7) * np.array([1, 2, 3, 4, 5, 6, 0.5]) + 1.0
    n = LinearNormalizer().fit(data, mode="limits")
    z = n.normalize(data)
    assert z.min() >= -1.0 - 1e-5 and z.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(n.unnormalize(z), data, rtol=1e-4, atol=1e-4)
    g = LinearNormalizer().fit(data, mode="gaussian")
    zg = g.normalize(data)
    np.testing.assert_allclose(zg.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(zg.std(0), 1.0, atol=1e-4)
    # state dict roundtrip
    g2 = LinearNormalizer().load_state_dict(g.state_dict())
    np.testing.assert_allclose(g2.normalize(data), zg)


def test_diffusion_unet_and_sampler():
    from deer_vla_tpu.models.diffusion import (DiffusionConfig,
                                               conditional_sample,
                                               ddpm_buffers, diffusion_loss,
                                               init_unet, unet_forward)
    cfg = DiffusionConfig(input_dim=7, horizon=8, global_cond_dim=16,
                          down_dims=(16, 32), diffusion_step_embed_dim=16,
                          n_groups=4, n_timesteps=5)
    p = init_unet(jax.random.PRNGKey(0), cfg)
    buf = ddpm_buffers(cfg)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 8, 7), jnp.float32)
    cond = jnp.asarray(r.randn(2, 16), jnp.float32)
    eps = unet_forward(p, x, jnp.asarray([1, 3]), cfg, cond)
    assert eps.shape == x.shape
    assert np.all(np.isfinite(np.asarray(eps)))

    # inpainting-conditioned sampling: history rows stay clamped
    mask = np.zeros((2, 8, 7), bool)
    mask[:, :3] = True
    sample = conditional_sample(p, buf, jax.random.PRNGKey(1), x,
                                jnp.asarray(mask), cfg, cond)
    np.testing.assert_array_equal(np.asarray(sample)[mask], np.asarray(x)[mask])
    assert np.all(np.isfinite(np.asarray(sample)))

    # DDIM fast sampler: K << n_timesteps U-Net evals; cond rows clamped,
    # eta=0 deterministic given the rng, finite output
    from deer_vla_tpu.models.diffusion import conditional_sample_ddim
    for steps in (1, 3, cfg.n_timesteps):
        s1 = conditional_sample_ddim(p, buf, jax.random.PRNGKey(1), x,
                                     jnp.asarray(mask), cfg, cond,
                                     steps=steps, eta=0.0)
        np.testing.assert_array_equal(np.asarray(s1)[mask],
                                      np.asarray(x)[mask])
        assert np.all(np.isfinite(np.asarray(s1)))
    s2 = conditional_sample_ddim(p, buf, jax.random.PRNGKey(1), x,
                                 jnp.asarray(mask), cfg, cond,
                                 steps=3, eta=0.0)
    s3 = conditional_sample_ddim(p, buf, jax.random.PRNGKey(1), x,
                                 jnp.asarray(mask), cfg, cond,
                                 steps=3, eta=0.0)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s3))

    loss = diffusion_loss(p, buf, jax.random.PRNGKey(2), x, cfg, cond)
    assert np.isfinite(float(loss))

    # loss decreases under a few adam steps (training path sanity)
    import optax
    opt = optax.adam(1e-3)
    st = opt.init(p)
    lfn = jax.jit(lambda p, k: diffusion_loss(p, buf, k, x, cfg, cond))
    g = jax.jit(jax.grad(lambda p, k: diffusion_loss(p, buf, k, x, cfg, cond)))
    l0 = float(lfn(p, jax.random.PRNGKey(3)))
    for i in range(10):
        grads = g(p, jax.random.PRNGKey(3))
        upd, st = opt.update(grads, st)
        p = optax.apply_updates(p, upd)
    l1 = float(lfn(p, jax.random.PRNGKey(3)))
    assert l1 < l0


def test_fc_decoder_state_and_dropout():
    """use_state: fc_state (7->1024->512->128) embedding concatenated to the
    pooled features, action/gripper MLPs sized hidden+128 (working version
    of the reference's dead fc+state path — see init_fc_decoder docstring);
    dropout actually perturbs training-mode outputs."""
    from deer_vla_tpu.models.alt_heads import (fc_decoder_forward,
                                               init_fc_decoder)
    cfg = small_head_cfg(use_state=True, dropout=0.3)
    p = init_fc_decoder(jax.random.PRNGKey(0), cfg)
    assert "fc_state" in p
    assert p["actions"]["layers"][0]["w"].shape[0] == cfg.hidden_size + 128
    r = np.random.RandomState(0)
    feat = jnp.asarray(r.randn(8, 5, 16), jnp.float32)
    state = jnp.asarray(r.randn(8, 1, 1, 15).astype(np.float32))
    out = fc_decoder_forward(p, feat, cfg, state=state)
    out2 = fc_decoder_forward(p, feat, cfg, state=10.0 + state)
    assert not np.allclose(np.asarray(out.actions), np.asarray(out2.actions))
    # eval mode is deterministic; train mode with rng differs (dropout live)
    out3 = fc_decoder_forward(p, feat, cfg, state=state)
    np.testing.assert_array_equal(np.asarray(out.actions),
                                  np.asarray(out3.actions))
    outd = fc_decoder_forward(p, feat, cfg, state=state,
                              dropout_rng=jax.random.PRNGKey(7), train=True)
    assert not np.allclose(np.asarray(out.actions), np.asarray(outd.actions))


def test_gpt_decoder_dropout_and_state_refusal():
    """GPT backbone dropout (GPT2 pdrop=0.1 defaults) is live in train mode
    and off in eval; gpt + use_state is refused loudly (the reference
    forward never consumes state)."""
    import dataclasses as dc

    from deer_vla_tpu.models.alt_heads import (GPTDecoderConfig,
                                               gpt_decoder_forward,
                                               init_gpt_decoder)
    cfg = GPTDecoderConfig(head=small_head_cfg(), n_layer=2, n_head=2,
                           dropout=0.2)
    p = init_gpt_decoder(jax.random.PRNGKey(0), cfg)
    feat = jnp.asarray(np.random.RandomState(0).randn(8, 5, 16), jnp.float32)
    a = gpt_decoder_forward(p, feat, cfg)
    b = gpt_decoder_forward(p, feat, cfg)
    np.testing.assert_array_equal(np.asarray(a.actions), np.asarray(b.actions))
    d = gpt_decoder_forward(p, feat, cfg, dropout_rng=jax.random.PRNGKey(3),
                            train=True)
    assert not np.allclose(np.asarray(a.actions), np.asarray(d.actions))

    from deer_vla_tpu.core.config import deer_tiny
    from deer_vla_tpu.models.heads import check_head_type
    bad = dc.replace(deer_tiny(), head_type="gpt", use_state=True)
    with pytest.raises(NotImplementedError, match="gpt"):
        check_head_type(bad)
