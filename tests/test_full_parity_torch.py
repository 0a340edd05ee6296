"""FULL-MODEL fp32 parity vs an independent torch replica of the reference
architecture (BASELINE.json north star: per-exit action outputs at fp32).

Component parity (ViT, LSTM, losses, attention, ALiBi slopes) is covered in
test_parity_torch.py / test_convert.py.  This file closes the loop: a torch
MPTFlamingo replica — written from the reference module definitions
(helpers.py:25-279 perceiver + masked x-attn, mosaic_gpt_3b.py:158-449 MPT
with ALiBi, flamingo_mpt.py:308-517 fusion + exit heads,
action_head.py:408-611 DeterministicDecoder) — is converted through
utils/convert.convert_state_dict into our param tree, and the COMPOSED
forwards are compared end to end:

  * per-exit actions + gripper logits from forward_train (all exits)
  * streaming forward_fixed_exit at two depths with threaded LSTM carry

Any divergence in LN placement, masking, ALiBi, pooling, gating, or the
converter's weight layout fails here at fp32 tolerance.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from deer_vla_tpu.core.config import DeerConfig, deer_tiny  # noqa: E402
from deer_vla_tpu.utils.convert import convert_state_dict  # noqa: E402

from test_convert import TorchHead, TorchViT  # noqa: E402


# ---------------------------------------------------------------------------
# torch replica modules (reference math, independent implementation)
# ---------------------------------------------------------------------------


def _ff(dim, mult=4):
    """helpers.py:15-22."""
    inner = dim * mult
    return nn.Sequential(nn.LayerNorm(dim), nn.Linear(dim, inner, bias=False),
                         nn.GELU(), nn.Linear(inner, dim, bias=False))


class TPerceiverAttention(nn.Module):
    """helpers.py:25-66."""

    def __init__(self, dim, dim_head, heads):
        super().__init__()
        inner = dim_head * heads
        self.heads, self.dim_head = heads, dim_head
        self.norm_media = nn.LayerNorm(dim)
        self.norm_latents = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, latents):
        x = self.norm_media(x)
        latents = self.norm_latents(latents)
        q = self.to_q(latents)
        k, v = self.to_kv(torch.cat([x, latents], dim=-2)).chunk(2, dim=-1)

        def h(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = h(q), h(k), h(v)
        sim = (q * self.dim_head ** -0.5) @ k.transpose(-2, -1)
        sim = sim - sim.amax(dim=-1, keepdim=True).detach()
        out = sim.softmax(dim=-1) @ v
        b, hh, n, d = out.shape
        return self.to_out(out.transpose(1, 2).reshape(b, n, hh * d))


class TPerceiver(nn.Module):
    """helpers.py:68-132 (T folded into batch; frame/time embs None)."""

    def __init__(self, dim, depth, dim_head, heads, num_latents):
        super().__init__()
        self.latents = nn.Parameter(torch.randn(num_latents, dim))
        self.layers = nn.ModuleList(
            [nn.ModuleList([TPerceiverAttention(dim, dim_head, heads),
                            _ff(dim)]) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        # x: (B, v, D) tokens of ONE frame per row
        lat = self.latents.expand(x.shape[0], -1, -1)
        for attn, ff in self.layers:
            lat = attn(x, lat) + lat
            lat = ff(lat) + lat
        return self.norm(lat)


class TMaskedCrossAttention(nn.Module):
    """helpers.py:136-233 with only_attend_immediate_media media-time mask."""

    def __init__(self, dim, dim_visual, dim_head, heads):
        super().__init__()
        inner = dim_head * heads
        self.heads, self.dim_head = heads, dim_head
        self.norm = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim_visual, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, media, media_locations):
        b, t_txt, _ = x.shape
        _, t_img, n, _ = media.shape
        q = self.to_q(self.norm(x))
        k, v = self.to_kv(media.reshape(b, t_img * n, -1)).chunk(2, dim=-1)

        def h(t):
            return t.reshape(b, t.shape[1], self.heads,
                             self.dim_head).transpose(1, 2)

        q, k, v = h(q), h(k), h(v)
        text_time = media_locations.to(torch.long).cumsum(dim=-1)  # (B, Tt)
        media_time = torch.arange(1, t_img + 1).repeat_interleave(n)
        allowed = text_time[:, :, None] == media_time[None, None, :]
        sim = (q * self.dim_head ** -0.5) @ k.transpose(-2, -1)
        sim = sim.masked_fill(~allowed[:, None], float("-inf"))
        sim = sim - sim.amax(dim=-1, keepdim=True).detach()
        attn = sim.softmax(dim=-1)
        out = attn @ v
        out = out.transpose(1, 2).reshape(b, t_txt, -1)
        # text before any media attends to nothing (helpers.py:222-229)
        out = out.masked_fill((text_time == 0)[:, :, None], 0.0)
        return self.to_out(out)


class TGatedXAttn(nn.Module):
    """helpers.py:236-279 (tanh-gated residuals, gates init 0 but set
    nonzero in the test so gating is actually exercised)."""

    def __init__(self, dim, dim_visual, dim_head, heads):
        super().__init__()
        self.attn = TMaskedCrossAttention(dim, dim_visual, dim_head, heads)
        self.attn_gate = nn.Parameter(torch.tensor([0.0]))
        self.ff = _ff(dim)
        self.ff_gate = nn.Parameter(torch.tensor([0.0]))

    def forward(self, x, media, media_locations):
        x = self.attn(x, media, media_locations) * self.attn_gate.tanh() + x
        return self.ff(x) * self.ff_gate.tanh() + x


class TMPTAttention(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads, self.head_dim = heads, d // heads
        self.Wqkv = nn.Linear(d, 3 * d, bias=False)
        self.out_proj = nn.Linear(d, d, bias=False)

    def forward(self, x, bias):
        b, s, d = x.shape
        q, k, v = self.Wqkv(x).chunk(3, dim=-1)

        def h(t):
            return t.reshape(b, s, self.heads, self.head_dim).transpose(1, 2)

        q, k, v = h(q), h(k), h(v)
        sim = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5 + bias
        out = sim.softmax(dim=-1) @ v
        return self.out_proj(out.transpose(1, 2).reshape(b, s, d))


class TMPTBlock(nn.Module):
    """MPT-1B GPTBlock: pre-LN attn + pre-LN GELU MLP, no biases."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = TMPTAttention(d, heads)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.mlp_up = nn.Linear(d, 4 * d, bias=False)
        self.mlp.mlp_down = nn.Linear(4 * d, d, bias=False)

    def forward(self, x, bias):
        x = x + self.attn(self.ln_1(x), bias)
        return x + self.mlp.mlp_down(F.gelu(self.mlp.mlp_up(self.ln_2(x))))


def _alibi_causal_pad_bias(mask, n_heads, alibi_bias_max=8.0):
    """llm-foundry ALiBi (power-of-2 rounding + interleave) + causal +
    key-padding, torch-side (mosaic_gpt_3b.py:158-219)."""
    s = mask.shape[-1]
    _n = 2 ** math.ceil(math.log2(n_heads))
    m = torch.arange(1, _n + 1, dtype=torch.float32) * (alibi_bias_max / _n)
    slopes = 1.0 / torch.pow(2.0, m)
    if _n != n_heads:
        slopes = torch.cat([slopes[1::2], slopes[::2]])[:n_heads]
    pos = torch.arange(1 - s, 1, dtype=torch.float32)
    alibi = (pos[None, :] * slopes[:, None])[None, :, None, :]  # (1,H,1,S)
    causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
    allowed = causal[None, None] & mask[:, None, None, :].bool()
    return alibi + torch.where(allowed, 0.0, -1e9)


class TFlamingoLayer(nn.Module):
    """flamingo_lm.py:6-46 naming: gated_cross_attn_layer + decoder_layer."""

    def __init__(self, d, vis_dim, dim_head, heads, mpt_heads):
        super().__init__()
        self.gated_cross_attn_layer = TGatedXAttn(d, vis_dim, dim_head, heads)
        self.decoder_layer = TMPTBlock(d, mpt_heads)

    def forward(self, x, media, media_locations, bias):
        x = self.gated_cross_attn_layer(x, media, media_locations)
        return self.decoder_layer(x, bias)


class TorchDeerReplica(nn.Module):
    """Composed MPTFlamingo replica: post fusion, shared resampler, LSTM
    heads at every exit (flamingo_mpt.py:308-517)."""

    def __init__(self, cfg: DeerConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.mpt.d_model
        self.vision_encoder = nn.Module()
        self.vision_encoder.visual = TorchViT(cfg.vit)
        p = cfg.perceiver
        self.perceiver = TPerceiver(p.dim, p.depth, p.dim_head, p.heads,
                                    p.num_latents)
        self.lang_encoder = nn.Module()
        self.lang_encoder.transformer = nn.ModuleDict({
            "wte": nn.Embedding(cfg.mpt.vocab_size, d),
            "blocks": nn.ModuleList(
                [TFlamingoLayer(d, cfg.vis_dim, cfg.xattn_dim_head,
                                cfg.xattn_heads, cfg.mpt.n_heads)
                 for _ in range(cfg.n_layers)]),
            "ln_f": nn.LayerNorm(d),
        })
        # MPT no_bias: strip decoder linear/LN biases (mosaic_gpt_3b.py:147)
        for mod in self.lang_encoder.transformer["blocks"].modules():
            if isinstance(mod, (nn.Linear, nn.LayerNorm)) and \
                    mod.bias is not None:
                mod.register_parameter("bias", None)
        self.lang_encoder.transformer["ln_f"].register_parameter("bias", None)
        self.lm_head = TorchHead(cfg.head)
        self.extra_exit = TorchHead(cfg.head)
        self.lm_exit_modules = nn.ModuleList(
            [TorchHead(cfg.head) for _ in cfg.exit_layer_ids()])

    def encode_media(self, vision_x, vision_gripper):
        """post fusion: per-camera perceiver latents concat on the token dim
        (flamingo_mpt.py:609-668).  inputs (B*W, 1, 1, 3, H, W)."""
        def cam(v):
            flat = v.reshape(-1, *v.shape[-3:])
            _, tok = self.vision_encoder.visual(flat)
            return self.perceiver(tok)
        rgb = cam(vision_x)
        grip = cam(vision_gripper)
        return torch.cat([rgb, grip], dim=1)[:, None]  # (B*W, T=1, 2n, d)

    def hidden_states(self, vision_x, vision_gripper, lang_x, mask):
        media = self.encode_media(vision_x, vision_gripper)
        x = self.lang_encoder.transformer["wte"](lang_x)
        media_locations = lang_x == self.cfg.media_token_id
        bias = _alibi_causal_pad_bias(mask, self.cfg.mpt.n_heads,
                                      self.cfg.mpt.alibi_bias_max)
        outs = []
        for blk in self.lang_encoder.transformer["blocks"]:
            x = blk(x, media, media_locations, bias)
            outs.append(x)
        return outs  # hidden_states[i] = OUTPUT of layer i

    def forward(self, vision_x, vision_gripper, lang_x, mask):
        """Per-exit actions like the multi-exit training forward."""
        hs = self.hidden_states(vision_x, vision_gripper, lang_x, mask)
        w = self.cfg.window_size
        outs = {}
        for j, layer_id in enumerate(self.cfg.exit_layer_ids()):
            outs[layer_id] = self.lm_exit_modules[j](hs[layer_id], w)
        outs[self.cfg.n_layers - 1] = self.lm_head(hs[-1], w)
        return outs


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def parity_setup():
    cfg = deer_tiny()  # fp32, post fusion, 4 layers, exits {1, 3}
    torch.manual_seed(0)
    replica = TorchDeerReplica(cfg).eval()
    with torch.no_grad():
        # nonzero gates so the x-attn path contributes (trained models have
        # open gates; zero gates would hide x-attn bugs)
        for blk in replica.lang_encoder.transformer["blocks"]:
            blk.gated_cross_attn_layer.attn_gate.fill_(0.7)
            blk.gated_cross_attn_layer.ff_gate.fill_(-0.4)

    from deer_vla_tpu.models.flamingo import init_deer
    params = init_deer(jax.random.PRNGKey(0), cfg)
    sd = {k: v.detach().to(torch.float32).numpy()
          for k, v in replica.state_dict().items()}
    counts = convert_state_dict(sd, params, cfg)
    assert counts["mpt_blocks"] == 6 * cfg.n_layers
    assert counts["xattn"] == 8 * cfg.n_layers

    r = np.random.RandomState(0)
    B, W, S = 2, cfg.window_size, cfg.text_len
    hw = cfg.vit.image_size
    vis = r.randn(B * W, 1, 1, 3, hw, hw).astype(np.float32)
    grip = r.randn(B * W, 1, 1, 3, hw, hw).astype(np.float32)
    ids = r.randint(5, cfg.mpt.vocab_size - 5, size=(B * W, S))
    ids[:, 0] = cfg.media_token_id
    ids = ids.astype(np.int32)
    mask = np.ones((B * W, S), np.int32)
    mask[:, -2:] = 0  # exercise key-padding in both attentions
    return cfg, replica, params, (vis, grip, ids, mask)


def test_train_forward_all_exits_match(parity_setup):
    cfg, replica, params, (vis, grip, ids, mask) = parity_setup
    with torch.no_grad():
        t_outs = replica(torch.from_numpy(vis), torch.from_numpy(grip),
                         torch.from_numpy(ids.astype(np.int64)),
                         torch.from_numpy(mask))

    from deer_vla_tpu.models.flamingo import forward_train
    fwd = jax.jit(lambda p, a, b, c, d: forward_train(
        p, a, c, d, cfg, jax.random.PRNGKey(1), vision_gripper=b,
        train=False))
    out = fwd(params, jnp.asarray(vis), jnp.asarray(grip), jnp.asarray(ids),
              jnp.asarray(mask))

    exit_ids = list(cfg.exit_layer_ids())
    jax_outs = {**{e: o for e, o in zip(exit_ids, out.exit_outputs)},
                cfg.n_layers - 1: out.final_output}
    for layer_id, (act_t, grip_t) in t_outs.items():
        j = jax_outs[layer_id]
        np.testing.assert_allclose(
            np.asarray(j.actions), act_t.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"exit {layer_id} actions")
        np.testing.assert_allclose(
            np.asarray(j.gripper_probs), grip_t.numpy(), rtol=2e-4,
            atol=2e-4, err_msg=f"exit {layer_id} gripper")


def test_streaming_fixed_exit_matches(parity_setup):
    """forward_fixed_exit with threaded carry == torch replica streaming the
    LSTM hidden state one frame at a time (action_head.py:546-558)."""
    cfg, replica, params, (vis, grip, ids, mask) = parity_setup
    from deer_vla_tpu.models.flamingo import forward_fixed_exit

    exit_id = cfg.exit_layer_ids()[0]
    step = jax.jit(lambda p, a, b, c, d, carry: forward_fixed_exit(
        p, a, c, d, cfg, exit_id, vision_gripper=b, carry=carry))

    # torch side: full-window hidden states once, then stream the head
    with torch.no_grad():
        hs = replica.hidden_states(
            torch.from_numpy(vis), torch.from_numpy(grip),
            torch.from_numpy(ids.astype(np.int64)), torch.from_numpy(mask))
        feat = hs[exit_id]  # (B*W, S, d)
        pooled = feat.max(dim=1).values.reshape(-1, cfg.window_size,
                                                feat.shape[-1])
        head = replica.extra_exit
        y, _ = head.rnn(pooled)  # full-window LSTM == streamed steps
        act_t = head.actions.mlp(y)  # TorchHead mlp ends in Tanh already

    carry = None
    W = cfg.window_size
    for w in range(W):
        rows = slice(w, vis.shape[0], W)  # frame w of each trajectory? no:
        # rows of frame w are interleaved (B*W layout is trajectory-major)
        idx = np.arange(vis.shape[0]).reshape(-1, W)[:, w]
        o, carry = step(params, jnp.asarray(vis[idx]), jnp.asarray(grip[idx]),
                        jnp.asarray(ids[idx]), jnp.asarray(mask[idx]), carry)
        np.testing.assert_allclose(
            np.asarray(o.actions[:, 0]), act_t[:, w].numpy(), rtol=2e-4,
            atol=2e-4, err_msg=f"stream step {w}")
