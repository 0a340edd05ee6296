"""Converter name-coverage proof (VERDICT round-2 item 6).

The reference's product path composes two torch checkpoints
(eval_calvin.py:543-577): the OpenFlamingo base and the DeeR trainable-only
delta (train_utils.py:631-638).  Real artifacts are not in this environment,
but the KEY INVENTORY those checkpoints draw from is fully determined by the
reference module definitions — MPTFlamingo (flamingo_mpt.py:96-259) holding
the open_clip CLIP model, PerceiverResampler + GatedCrossAttentionBlock
(helpers.py:68-279), MosaicGPT transformer dict (mosaic_gpt_3b.py:87-110),
FlamingoLayer wrapping (flamingo_lm.py:6-46), and DeterministicDecoder heads
(action_head.py:408-611).

These tests rebuild that inventory with REAL torch nn.Modules mirroring the
reference's attribute structure at tiny dims — so the state-dict names come
from module composition exactly as they would from the published weights —
then run `convert_with_audit` and assert ZERO unconsumed keys.  Any naming
drift between the converter and the reference modules fails here, before a
real artifact ever produces silently-unloaded weights.
"""

import dataclasses

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from deer_vla_tpu.core.config import DeerConfig, deer_tiny  # noqa: E402
from deer_vla_tpu.utils.convert import (convert_vit,  # noqa: E402
                                        convert_with_audit)

from test_convert import TorchHead, TorchViT  # noqa: E402


def _strip_biases(module: nn.Module) -> nn.Module:
    """MPT no_bias=True: every Linear/LayerNorm bias is removed from the
    module (mosaic_gpt_3b.py:147-153 zaps them), so the published state dict
    carries no bias keys."""
    for m in module.modules():
        if hasattr(m, "bias") and isinstance(getattr(m, "bias"), nn.Parameter):
            m.register_parameter("bias", None)
    return module


def _feed_forward(dim, mult=4):
    """helpers.py:15-22 FeedForward: Sequential(LN, Linear, GELU, Linear)."""
    inner = dim * mult
    return nn.Sequential(nn.LayerNorm(dim), nn.Linear(dim, inner, bias=False),
                         nn.GELU(), nn.Linear(inner, dim, bias=False))


class TorchPerceiverAttention(nn.Module):
    """helpers.py:25-37 naming."""

    def __init__(self, dim, dim_head, heads):
        super().__init__()
        inner = dim_head * heads
        self.norm_media = nn.LayerNorm(dim)
        self.norm_latents = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)


class TorchPerceiver(nn.Module):
    """helpers.py:68-105: latents + layers=ModuleList[ModuleList[attn, ff]]
    + norm."""

    def __init__(self, dim, depth, dim_head, heads):
        super().__init__()
        self.latents = nn.Parameter(torch.randn(8, dim))
        self.layers = nn.ModuleList(
            [nn.ModuleList([TorchPerceiverAttention(dim, dim_head, heads),
                            _feed_forward(dim)]) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)


class TorchMaskedCrossAttention(nn.Module):
    """helpers.py:136-160 naming."""

    def __init__(self, dim, dim_visual, dim_head, heads):
        super().__init__()
        inner = dim_head * heads
        self.norm = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim_visual, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)


class TorchGatedXAttn(nn.Module):
    """helpers.py:236-258: attn + attn_gate + ff + ff_gate."""

    def __init__(self, dim, dim_visual, dim_head, heads):
        super().__init__()
        self.attn = TorchMaskedCrossAttention(dim, dim_visual, dim_head, heads)
        self.attn_gate = nn.Parameter(torch.tensor([0.0]))
        self.ff = _feed_forward(dim)
        self.ff_gate = nn.Parameter(torch.tensor([0.0]))


class TorchMPTAttention(nn.Module):
    """mosaic MPT attention: Wqkv + out_proj (+ q_ln/k_ln under qk_ln)."""

    def __init__(self, d, qk_ln):
        super().__init__()
        self.Wqkv = nn.Linear(d, 3 * d, bias=False)
        if qk_ln:
            self.q_ln = nn.LayerNorm(d)
            self.k_ln = nn.LayerNorm(d)
        self.out_proj = nn.Linear(d, d, bias=False)


class TorchMPTBlock(nn.Module):
    """MPT-1B GPTBlock naming: ln_1 / attn / ln_2 / mlp.mlp_up+mlp_down."""

    def __init__(self, d, qk_ln):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = TorchMPTAttention(d, qk_ln)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.mlp_up = nn.Linear(d, 4 * d, bias=False)
        self.mlp.mlp_down = nn.Linear(4 * d, d, bias=False)


class TorchFlamingoLayer(nn.Module):
    """flamingo_lm.py:6-46: gated_cross_attn_layer + decoder_layer."""

    def __init__(self, d, vis_dim, dim_head, heads, qk_ln):
        super().__init__()
        self.gated_cross_attn_layer = TorchGatedXAttn(d, vis_dim, dim_head,
                                                      heads)
        self.decoder_layer = TorchMPTBlock(d, qk_ln)


class TorchComposedDeer(nn.Module):
    """MPTFlamingo at tiny dims with the reference's full attribute layout
    (flamingo_mpt.py:96-259): vision_encoder(CLIP).visual, perceiver,
    lang_encoder.transformer.{wte,blocks,ln_f}, lm_head / lm_exit_modules /
    extra_exit.  state_dict() of this module IS the reference key
    inventory."""

    def __init__(self, cfg: DeerConfig):
        super().__init__()
        d = cfg.mpt.d_model
        # CLIP: visual tower + text-tower glue the policy never touches
        self.vision_encoder = nn.Module()
        self.vision_encoder.visual = TorchViT(cfg.vit)
        self.vision_encoder.visual.proj = nn.Parameter(
            torch.randn(cfg.vit.width, 16))
        self.vision_encoder.token_embedding = nn.Embedding(32, 16)
        self.vision_encoder.ln_final = nn.LayerNorm(16)
        self.vision_encoder.text_projection = nn.Parameter(torch.randn(16, 16))
        self.vision_encoder.logit_scale = nn.Parameter(torch.tensor(1.0))
        self.vision_encoder.register_buffer("attn_mask", torch.zeros(4, 4))

        p = cfg.perceiver
        self.perceiver = TorchPerceiver(p.dim, p.depth, p.dim_head, p.heads)

        self.lang_encoder = nn.Module()
        self.lang_encoder.transformer = nn.ModuleDict({
            "wte": nn.Embedding(cfg.mpt.vocab_size, d),
            "blocks": nn.ModuleList(
                [TorchFlamingoLayer(d, cfg.vis_dim, cfg.xattn_dim_head,
                                    cfg.xattn_heads, cfg.mpt.qk_ln)
                 for _ in range(cfg.n_layers)]),
            "ln_f": nn.LayerNorm(d),
        })
        # MPT's no_bias zap runs during MPT __init__ (mosaic_gpt_3b.py:
        # 147-153), BEFORE Flamingo wrapping — so only the decoder_layer
        # halves are bias-less; the gated x-attn (open_flamingo helpers.py)
        # keeps its LayerNorm biases.
        for blk in self.lang_encoder.transformer["blocks"]:
            _strip_biases(blk.decoder_layer)
        self.lang_encoder.transformer["ln_f"].register_parameter("bias", None)

        self.lm_head = TorchHead(cfg.head)
        self.extra_exit = TorchHead(cfg.head)
        self.lm_exit_modules = nn.ModuleList(
            [TorchHead(cfg.head) for _ in cfg.exit_layer_ids()])


def _qk_tiny():
    cfg = deer_tiny()
    return dataclasses.replace(
        cfg, mpt=dataclasses.replace(cfg.mpt, qk_ln=True))


def test_full_inventory_zero_unconsumed():
    """Every key the composed reference model can put in a checkpoint is
    either consumed by the converter or on the documented ignore list."""
    cfg = _qk_tiny()
    from deer_vla_tpu.models.flamingo import init_deer
    params = init_deer(jax.random.PRNGKey(0), cfg)

    mirror = TorchComposedDeer(cfg)
    sd = {k: v.detach().to(torch.float32).numpy()
          for k, v in mirror.state_dict().items()}
    counts, report = convert_with_audit(sd, params, cfg)

    assert not report["unconsumed"], sorted(report["unconsumed"])
    # the ignore list matched only CLIP glue, nothing load-bearing
    assert all(k.startswith("vision_encoder.") and ".visual." not in k
               or k == "vision_encoder.visual.proj"
               for k in report["ignored"]), sorted(report["ignored"])

    # structural counts: nothing silently skipped on the consuming side
    assert counts["vit"] == 5 + 6 * cfg.vit.layers
    assert counts["perceiver"] == 2 + 6 * cfg.perceiver.depth
    assert counts["mpt_blocks"] == (6 + 2) * cfg.n_layers  # +2 = q_ln/k_ln
    assert counts["xattn"] == 8 * cfg.n_layers
    assert counts["wte"] == 1 and counts["ln_f"] == 1
    n_lstm = cfg.head.lstm_num_layers * 4
    n_mlp = 2 * (cfg.head.mlp_num_hidden_layers + 1)
    for head in ("lm_head", "extra_exit",
                 *(f"exit_{i}" for i in cfg.exit_layer_ids())):
        assert counts[head] == n_lstm + n_mlp, (head, counts[head])

    # value spot checks: the new consumers landed where they should
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["ln_f"]["scale"]),
        sd["lang_encoder.transformer.ln_f.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["blocks"][0]["q_ln"]["scale"]),
        sd["lang_encoder.transformer.blocks.0.decoder_layer.attn.q_ln.weight"])


def test_truncated_base_blocks_not_drift():
    """A FULL-depth base checkpoint composed into a truncated config must
    not trip the naming-drift error: the reference deletes layers >= the
    early-exit depth and loads strict=False (eval_calvin.py:543), so e.g.
    OpenFlamingo-3B's blocks 12-23 are expected extras under max_layer=12."""
    full = deer_tiny(n_layers=4)
    trunc = deer_tiny(n_layers=2, exit_interval=2)
    from deer_vla_tpu.models.flamingo import init_deer
    params = init_deer(jax.random.PRNGKey(0), trunc)

    mirror = TorchComposedDeer(full)  # 4-layer "published base"
    # a base checkpoint carries no action/exit heads — those live in the delta
    sd = {k: v.detach().to(torch.float32).numpy()
          for k, v in mirror.state_dict().items()
          if not k.startswith(("lm_head.", "lm_exit_modules.",
                               "extra_exit."))}
    counts, report = convert_with_audit(sd, params, trunc)
    assert not report["unconsumed"], sorted(report["unconsumed"])
    assert report["truncated"], "expected beyond-truncation keys"
    assert all(".blocks.2." in k or ".blocks.3." in k
               for k in report["truncated"]), sorted(report["truncated"])
    assert counts["mpt_blocks"] == 6 * trunc.n_layers


def test_state_embed_keys_consumed():
    """--use_state checkpoints add embed_arm_state.0 / embed_gripper_state.0
    / embed_state to every head (action_head.py:447-449)."""
    cfg = deer_tiny()
    cfg = dataclasses.replace(
        cfg, use_state=True,
        head=dataclasses.replace(cfg.head, use_state=True))
    from deer_vla_tpu.models.action_head import init_head
    params = init_head(jax.random.PRNGKey(0), cfg.head)

    class TorchStateHead(TorchHead):
        def __init__(self, hcfg):
            super().__init__(hcfg)
            f = hcfg.in_features
            self.embed_arm_state = nn.Sequential(nn.Linear(6, f), nn.ReLU())
            self.embed_gripper_state = nn.Sequential(nn.Embedding(2, f),
                                                     nn.ReLU())
            self.embed_state = nn.Linear(2 * f, f)

    tm = TorchStateHead(cfg.head)
    sd = {"extra_exit." + k: v.detach().numpy()
          for k, v in tm.state_dict().items()}
    from deer_vla_tpu.utils.convert import _TrackingDict, convert_head
    tracked = _TrackingDict(sd)
    convert_head(tracked, params, "extra_exit.")
    assert set(tracked) == tracked.consumed, \
        sorted(set(tracked) - tracked.consumed)
    np.testing.assert_array_equal(
        np.asarray(params["embed_state"]["w"]),
        sd["extra_exit.embed_state.weight"].T)


def test_open_clip_raw_prefix():
    """The ViT can also arrive as a raw open_clip checkpoint (visual.*
    prefix, factory.py:109-113 downloads it separately from the OF ckpt)."""
    cfg = deer_tiny()
    from deer_vla_tpu.models.flamingo import init_deer
    params = init_deer(jax.random.PRNGKey(1), cfg)
    tv = TorchViT(cfg.vit)
    sd = {"visual." + k: v.detach().numpy()
          for k, v in tv.state_dict().items()}
    n = convert_vit(sd, params, prefix="visual.")
    assert n == 5 + 6 * cfg.vit.layers
    np.testing.assert_array_equal(
        np.asarray(params["vit"]["blocks"][0]["ln_1"]["scale"]),
        sd["visual.transformer.resblocks.0.ln_1.weight"])
