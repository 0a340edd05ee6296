"""Weight-converter tests: build torch modules with the reference's naming
(open_clip ViT resblocks use nn.MultiheadAttention; heads use nn.LSTM +
Sequential MLPs), convert, and check fp32 forward parity end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from deer_vla_tpu.core.config import HeadConfig, ViTConfig, deer_tiny  # noqa: E402
from deer_vla_tpu.models.vit import init_vit, vit_forward  # noqa: E402
from deer_vla_tpu.utils.convert import (convert_head, convert_state_dict,  # noqa: E402
                                        convert_vit)


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchResBlock(nn.Module):
    """open_clip ResidualAttentionBlock layout (attn = nn.MultiheadAttention)."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * d, d))

    def forward(self, x):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchViT(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d = cfg.width
        self.conv1 = nn.Conv2d(3, d, cfg.patch_size, cfg.patch_size, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(d) * d ** -0.5)
        self.positional_embedding = nn.Parameter(torch.randn(cfg.seq_len, d) * d ** -0.5)
        self.ln_pre = nn.LayerNorm(d)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [TorchResBlock(d, cfg.heads) for _ in range(cfg.layers)])
        self.ln_post = nn.LayerNorm(d)

    def forward(self, x):
        x = self.conv1(x)  # (B, d, g, g)
        x = x.flatten(2).transpose(1, 2)  # (B, g*g, d)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.ln_post(x)
        return x[:, 0], x[:, 1:]


def test_vit_conversion_parity():
    cfg = ViTConfig(image_size=28, patch_size=14, width=32, layers=2, heads=4)
    tm = TorchViT(cfg)
    sd = {"vision_encoder.visual." + k: v.detach().numpy()
          for k, v in tm.state_dict().items()}
    params = init_vit(jax.random.PRNGKey(0), cfg)
    n = convert_vit(sd, {"vit": params})
    assert n >= 4 + 6 * cfg.layers

    x = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        _, tok_t = tm(torch.from_numpy(x))
    _, tok_j = vit_forward(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(tok_j), tok_t.numpy(),
                               rtol=1e-4, atol=1e-4)


class TorchHead(nn.Module):
    """DeterministicDecoder skeleton with the reference's parameter names."""

    def __init__(self, cfg: HeadConfig):
        super().__init__()
        self.rnn = nn.LSTM(cfg.in_features, cfg.hidden_size,
                           cfg.lstm_num_layers, batch_first=True)
        dims = (cfg.hidden_size,) + tuple(cfg.mlp_hidden_dims[:cfg.mlp_num_hidden_layers])

        def mlp(out_dim, final):
            seq = [nn.Dropout(0.0)]
            cur = dims[0]
            for d2 in dims[1:]:
                seq += [nn.Linear(cur, d2), nn.Identity(), nn.ReLU(), nn.Dropout(0.0)]
                cur = d2
            seq += [nn.Linear(cur, out_dim), final]
            m = nn.Module()
            m.mlp = nn.Sequential(*seq)
            return m

        self.actions = mlp(cfg.out_features, nn.Tanh())
        self.gripper = mlp(1, nn.Sigmoid())

    def forward(self, feat, window):
        # max-pool over lang tokens, reshape, LSTM, heads (action_head.py:519-605)
        pooled = feat.max(dim=1).values
        x = pooled.reshape(-1, window, pooled.shape[-1])
        y, _ = self.rnn(x)
        return self.actions.mlp(y), self.gripper.mlp(y)


def test_head_conversion_parity():
    cfg = HeadConfig(in_features=16, hidden_size=12, lstm_num_layers=2,
                     mlp_hidden_dims=(8, 6), mlp_num_hidden_layers=2,
                     window_size=3)
    tm = TorchHead(cfg)
    sd = {"lm_head." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    from deer_vla_tpu.models.action_head import head_forward, init_head
    params = init_head(jax.random.PRNGKey(0), cfg)
    n = convert_head(sd, params, "lm_head.")
    assert n == 2 * 4 + 2 * 3  # 2 lstm layers x4 tensors + 2 mlps x3 linears

    feat = np.random.RandomState(1).randn(6, 5, 16).astype(np.float32)
    with torch.no_grad():
        act_t, grip_t = tm(torch.from_numpy(feat), window=3)
    out = head_forward(params, jnp.asarray(feat), cfg, window=3)
    np.testing.assert_allclose(np.asarray(out.actions), act_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.gripper_probs), grip_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_full_state_dict_conversion_counts():
    """Name-level roundtrip over the whole tree with a synthetic state dict."""
    cfg = deer_tiny()
    from deer_vla_tpu.models.flamingo import init_deer
    params = init_deer(jax.random.PRNGKey(0), cfg)
    d = cfg.mpt.d_model
    sd = {}
    r = np.random.RandomState(0)
    for i in range(cfg.n_layers):
        b = f"lang_encoder.transformer.blocks.{i}.decoder_layer."
        sd[b + "ln_1.weight"] = r.randn(d).astype(np.float32)
        sd[b + "attn.Wqkv.weight"] = r.randn(3 * d, d).astype(np.float32)
        sd[b + "attn.out_proj.weight"] = r.randn(d, d).astype(np.float32)
        sd[b + "ln_2.weight"] = r.randn(d).astype(np.float32)
        sd[b + "mlp.mlp_up.weight"] = r.randn(4 * d, d).astype(np.float32)
        sd[b + "mlp.mlp_down.weight"] = r.randn(d, 4 * d).astype(np.float32)
        x = f"lang_encoder.transformer.blocks.{i}.gated_cross_attn_layer."
        sd[x + "attn.norm.weight"] = r.randn(d).astype(np.float32)
        sd[x + "attn.norm.bias"] = r.randn(d).astype(np.float32)
        sd[x + "attn.to_q.weight"] = r.randn(64, d).astype(np.float32)
        sd[x + "attn.to_kv.weight"] = r.randn(128, cfg.vis_dim).astype(np.float32)
        sd[x + "attn.to_out.weight"] = r.randn(d, 64).astype(np.float32)
        sd[x + "attn_gate"] = np.zeros(1, np.float32)
        sd[x + "ff.0.weight"] = r.randn(d).astype(np.float32)
        sd[x + "ff.0.bias"] = r.randn(d).astype(np.float32)
        sd[x + "ff.1.weight"] = r.randn(4 * d, d).astype(np.float32)
        sd[x + "ff.3.weight"] = r.randn(d, 4 * d).astype(np.float32)
        sd[x + "ff_gate"] = np.zeros(1, np.float32)
    sd["lang_encoder.transformer.wte.weight"] = r.randn(
        cfg.mpt.vocab_size, d).astype(np.float32)
    counts = convert_state_dict(sd, params, cfg)
    assert counts["mpt_blocks"] == 6 * cfg.n_layers
    assert counts["xattn"] == 8 * cfg.n_layers
    assert counts["wte"] == 1
    # value spot check: transposed Wqkv landed
    i0 = sd["lang_encoder.transformer.blocks.0.decoder_layer.attn.Wqkv.weight"]
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["blocks"][0]["wqkv"]["w"]), i0.T)
