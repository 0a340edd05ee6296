"""fp32 numerical parity vs torch reference ops.

The reference model's primitives are torch built-ins (nn.LSTM, layer_norm,
softmax attention, huber/BCE losses).  These tests copy OUR parameters into
the torch builtins and require agreement to ~1e-5, which pins the semantics
(gate order, eps, reduction conventions) the converted checkpoints rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def to_t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_lstm_matches_torch():
    from deer_vla_tpu.ops.lstm import init_lstm, lstm_forward

    in_dim, hidden, layers, b, t = 6, 8, 3, 2, 5
    params = init_lstm(jax.random.PRNGKey(0), in_dim, hidden, layers)
    tl = torch.nn.LSTM(in_dim, hidden, layers, batch_first=True)
    with torch.no_grad():
        for i, lp in enumerate(params["layers"]):
            getattr(tl, f"weight_ih_l{i}").copy_(to_t(lp["wi"]).T)
            getattr(tl, f"weight_hh_l{i}").copy_(to_t(lp["wh"]).T)
            getattr(tl, f"bias_ih_l{i}").copy_(to_t(lp["bi"]))
            getattr(tl, f"bias_hh_l{i}").copy_(to_t(lp["bh"]))

    x = np.random.RandomState(0).randn(b, t, in_dim).astype(np.float32)
    y_j, (h_j, c_j) = lstm_forward(params, jnp.asarray(x))
    with torch.no_grad():
        y_t, (h_t, c_t) = tl(to_t(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-5, atol=1e-5)

    # streaming step-by-step must equal the sequence run
    from deer_vla_tpu.ops.lstm import lstm_step, zero_carry
    carry = zero_carry(layers, b, hidden)
    for i in range(t):
        out, carry = lstm_step(params, jnp.asarray(x[:, i]), carry)
    np.testing.assert_allclose(np.asarray(out), y_t[:, -1].numpy(), rtol=1e-5, atol=1e-5)


def test_layernorm_matches_torch():
    from deer_vla_tpu.ops.layers import init_layernorm, layernorm
    d = 32
    p = init_layernorm(d)
    p = {"scale": jnp.asarray(np.random.randn(d), jnp.float32),
         "bias": jnp.asarray(np.random.randn(d), jnp.float32)}
    x = np.random.randn(4, d).astype(np.float32)
    y_j = layernorm(p, jnp.asarray(x))
    y_t = torch.nn.functional.layer_norm(
        to_t(x), (d,), to_t(p["scale"]), to_t(p["bias"]), eps=1e-5)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), rtol=1e-5, atol=1e-5)


def test_attention_matches_torch():
    from deer_vla_tpu.ops.attention import _xla_attention
    r = np.random.RandomState(1)
    b, h, sq, sk, d = 2, 4, 5, 7, 16
    q = r.randn(b, h, sq, d).astype(np.float32)
    k = r.randn(b, h, sk, d).astype(np.float32)
    v = r.randn(b, h, sk, d).astype(np.float32)
    bias = r.randn(b, h, sq, sk).astype(np.float32)
    out_j = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(bias), d ** -0.5)
    with torch.no_grad():
        logits = torch.einsum("bhqd,bhkd->bhqk", to_t(q), to_t(k)) * d ** -0.5
        logits = logits + to_t(bias)
        out_t = torch.einsum("bhqk,bhkd->bhqd", logits.softmax(-1), to_t(v))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5)


def test_alibi_slopes_known_values():
    from deer_vla_tpu.ops.alibi import alibi_slopes
    # 16 heads, bias_max 8: slope_i = 2^{-8*(i+1)/16} = 2^{-(i+1)/2}
    s = alibi_slopes(16, 8.0)
    expect = np.array([2 ** (-(i + 1) / 2) for i in range(16)], np.float32)
    np.testing.assert_allclose(s, expect, rtol=1e-6)
    # non-power-of-2 heads interleave (llm-foundry behavior)
    s12 = alibi_slopes(12, 8.0)
    assert len(s12) == 12 and np.all(s12 > 0) and np.all(s12 <= 1)


def test_losses_match_torch():
    from deer_vla_tpu.train.losses import bce_with_logits, huber
    r = np.random.RandomState(2)
    x = r.randn(8, 6).astype(np.float32) * 2
    y = r.randn(8, 6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(huber(jnp.asarray(x), jnp.asarray(y))),
        torch.nn.functional.huber_loss(to_t(x), to_t(y), reduction="none").numpy(),
        rtol=1e-5, atol=1e-5)
    t = (r.rand(8, 6) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t))),
        torch.nn.functional.binary_cross_entropy_with_logits(
            to_t(x), to_t(t), reduction="none").numpy(),
        rtol=1e-5, atol=1e-5)


def test_rand_shift_is_exact_crop():
    """Integer-shift grid_sample == integer crop of the edge-padded image."""
    from deer_vla_tpu.ops.rand_shift import random_shift
    r = np.random.RandomState(3)
    x = r.randn(3, 2, 16, 16).astype(np.float32)
    pad = 4
    out = np.asarray(random_shift(jax.random.PRNGKey(0), jnp.asarray(x), pad))
    assert out.shape == x.shape
    # every output must be a sub-window of the padded input
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    for n in range(x.shape[0]):
        found = False
        for sy in range(2 * pad + 1):
            for sx in range(2 * pad + 1):
                if np.allclose(out[n], xp[n, :, sy:sy + 16, sx:sx + 16]):
                    found = True
                    break
            if found:
                break
        assert found, f"sample {n} is not an integer crop"


def test_gelu_matches_torch():
    from deer_vla_tpu.ops.layers import quick_gelu
    x = np.linspace(-4, 4, 101).astype(np.float32)
    # exact gelu (perceiver FF / MPT MLP use erf gelu)
    np.testing.assert_allclose(
        np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False)),
        torch.nn.functional.gelu(to_t(x)).numpy(), rtol=1e-5, atol=1e-6)
    # quick gelu (CLIP ViT)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x))),
        (to_t(x) * torch.sigmoid(1.702 * to_t(x))).numpy(), rtol=1e-5, atol=1e-6)


def test_linear_init_matches_torch_default():
    """init_linear("torch") must match torch.nn.Linear's default
    kaiming_uniform_(a=sqrt(5)): uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import torch
    from deer_vla_tpu.ops.layers import init_linear
    d_in, d_out = 64, 32
    p = init_linear(jax.random.PRNGKey(0), d_in, d_out)
    w = np.asarray(p["w"])
    bound = 1.0 / np.sqrt(d_in)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range
    tw = torch.nn.Linear(d_in, d_out).weight.detach().numpy()
    assert abs(float(w.std()) - float(tw.std())) / float(tw.std()) < 0.15
