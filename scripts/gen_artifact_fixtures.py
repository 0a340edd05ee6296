"""Generate pinned key-inventory fixtures for the published checkpoints
(VERDICT r2 item 4: "pin expected key counts/shapes for 3B and 9B now").

Builds the torch mirror modules from tests/ (the same modules that prove
converter name coverage) on torch's META device at the REAL dims, so the
state-dict key->shape inventory comes from module composition exactly as it
would from the published weights — at zero memory cost.  Writes
tests/fixtures/artifact_keys_{mpt_dolly_3b,mpt_9b}.json, consumed by
scripts/verify_artifacts.py the day real artifacts land.

The real artifact set is FOUR sources (matching cli/convert's flags):
  clip_inventory  — raw open_clip ViT-L/14 visual tower (visual.*,
      factory.py:109-113); the text tower it also carries is converter-
      ignored and not pinned
  mpt_inventory   — raw HF MPT backbone (transformer.blocks.*, wte, final
      norm; MPT-1B mosaic naming for 3B, llm-foundry naming for 9B)
  openflamingo_inventory — the OpenFlamingo release checkpoint: the parts
      OpenFlamingo TRAINED (perceiver, gated x-attn at FULL depth, wte),
      saved under the composed/wrapped names (eval_calvin.py:543)
  delta_inventory — the DeeR trainable-delta at the published operating
      point (max_layer=12 truncation): perceiver, x-attn, wte, every
      action head (train_utils.py:631-638 saves requires_grad only)

Depth notes: MPT-1B-dolly is 24 layers, MPT-7B is 32 (HF model cards); the
DeeR-B operating point truncates to 12.  wte row counts can differ by the
2 special tokens OpenFlamingo appends (<image>, <|endofchunk|>) — the
verifier treats wte rows as advisory.  If a real artifact disagrees
anywhere, verify_artifacts.py reports the mismatch rather than crashing.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch
import torch.nn as nn


def _shapes(module: nn.Module, prefix: str = "") -> dict:
    return {prefix + k: list(v.shape) for k, v in module.state_dict().items()}


class Torch7BBlock(nn.Module):
    """llm-foundry MPT-7B block naming (modeling_gpt_9b.py MPTBlock):
    norm_1 / attn.Wqkv+out_proj / norm_2 / ffn.up_proj+down_proj, no
    biases."""

    def __init__(self, d):
        super().__init__()
        self.norm_1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.Wqkv = nn.Linear(d, 3 * d, bias=False)
        self.attn.out_proj = nn.Linear(d, d, bias=False)
        self.norm_2 = nn.LayerNorm(d)
        self.ffn = nn.Module()
        self.ffn.up_proj = nn.Linear(d, 4 * d, bias=False)
        self.ffn.down_proj = nn.Linear(4 * d, d, bias=False)
        for m in self.modules():
            if isinstance(m, nn.LayerNorm):
                m.register_parameter("bias", None)


def build(model: str):
    from test_convert import TorchHead, TorchViT
    from test_convert_coverage import (TorchGatedXAttn, TorchMPTBlock,
                                       TorchPerceiver, _strip_biases)

    from deer_vla_tpu.core.config import deer_3b, deer_9b, deer_tiny

    if model == "tiny":  # synthetic end-to-end test support
        full_depth = 4
        cfg_full = deer_tiny(n_layers=full_depth)
        cfg_op = deer_tiny()
    else:
        factory = {"mpt_dolly_3b": deer_3b, "mpt_9b": deer_9b}[model]
        full_depth = {"mpt_dolly_3b": 24, "mpt_9b": 32}[model]
        cfg_full = factory(max_layer=full_depth)
        cfg_op = factory()  # published operating point (max_layer=12)
    d = cfg_full.mpt.d_model

    with torch.device("meta"):
        clip = _shapes(TorchViT(cfg_full.vit), "visual.")

        if model in ("mpt_dolly_3b", "tiny"):
            blk_shapes = _shapes(
                _strip_biases(TorchMPTBlock(d, cfg_full.mpt.qk_ln)))
            ln_f_key = "ln_f"
        else:
            blk_shapes = _shapes(Torch7BBlock(d))
            ln_f_key = "norm_f"
        mpt = {"transformer.wte.weight": [cfg_full.mpt.vocab_size, d],
               f"transformer.{ln_f_key}.weight": [d]}
        for i in range(full_depth):
            for k, s in blk_shapes.items():
                mpt[f"transformer.blocks.{i}.{k}"] = s

        def perceiver_shapes(prefix):
            p = cfg_op.perceiver
            out = _shapes(TorchPerceiver(p.dim, p.depth, p.dim_head, p.heads),
                          prefix)
            # real num_latents, not the tiny mirror's hard-coded 8
            out[prefix + "latents"] = [p.num_latents, p.dim]
            return out

        xa = _shapes(TorchGatedXAttn(d, cfg_op.vis_dim, cfg_op.xattn_dim_head,
                                     cfg_op.xattn_heads))

        def xattn_shapes(depth, cfg):
            out = {}
            for i in range(depth):
                if cfg.has_xattn(i):
                    pre = (f"lang_encoder.transformer.blocks.{i}."
                           f"gated_cross_attn_layer.")
                    for k, s in xa.items():
                        out[pre + k] = s
            return out

        of = {"lang_encoder.transformer.wte.weight":
              [cfg_full.mpt.vocab_size, d]}
        of.update(perceiver_shapes("perceiver."))
        of.update(xattn_shapes(full_depth, cfg_full))

        delta = {"lang_encoder.transformer.wte.weight":
                 [cfg_op.mpt.vocab_size, d]}
        delta.update(perceiver_shapes("perceiver."))
        delta.update(xattn_shapes(cfg_op.n_layers, cfg_op))
        head = _shapes(TorchHead(cfg_op.head))
        for role in ("lm_head", "extra_exit",
                     *(f"lm_exit_modules.{j}"
                       for j in range(len(cfg_op.exit_layer_ids())))):
            for k, s in head.items():
                delta[f"{role}.{k}"] = s

    return {
        "model": model,
        "meta": {
            "base_full_depth": full_depth,
            "operating_max_layer": cfg_op.n_layers,
            "exit_layer_ids": list(cfg_op.exit_layer_ids()),
            "clip_keys": len(clip),
            "mpt_keys": len(mpt),
            "openflamingo_keys": len(of),
            "delta_keys": len(delta),
            "d_model": d,
            "vocab_size": cfg_full.mpt.vocab_size,
        },
        "clip_inventory": clip,
        "mpt_inventory": mpt,
        "openflamingo_inventory": of,
        "delta_inventory": delta,
    }


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    for model in ("mpt_dolly_3b", "mpt_9b"):
        inv = build(model)
        path = os.path.join(out_dir, f"artifact_keys_{model}.json")
        with open(path, "w") as f:
            json.dump(inv, f, indent=1, sort_keys=True)
        print(f"wrote {path}: {inv['meta']}")


if __name__ == "__main__":
    main()
