"""Static configuration dataclasses for the DeeR-VLA TPU stack.

The reference (yueyang130/DeeR-VLA) spreads configuration over ~90 argparse
flags (robot_flamingo/train/train_calvin_post_strategy.py:31-341), a hard
coded model registry (robot_flamingo/models/factory.py:13-26) and config
recovered by regexing checkpoint filenames (robot_flamingo/eval/
eval_calvin.py:356-421).  Here every model dimension is an explicit frozen
dataclass so that configs hash, are jit-static, and serialize to JSON next to
checkpoints instead of being encoded in filenames.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtype policy
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DTypePolicy:
    """Param / compute / accumulation dtypes.

    On TPU we keep parameters in fp32 (master copy) and compute in bf16 so the
    MXU runs at full rate; there is no GradScaler (reference uses CUDA AMP
    fp16, robot_flamingo/train/train_utils.py:407 — unnecessary with bf16).
    """

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"

    @property
    def pdt(self):
        return jnp.dtype(self.param_dtype)

    @property
    def cdt(self):
        return jnp.dtype(self.compute_dtype)


FP32 = DTypePolicy(param_dtype="float32", compute_dtype="float32")
BF16 = DTypePolicy(param_dtype="float32", compute_dtype="bfloat16")


# ---------------------------------------------------------------------------
# vision encoder (CLIP ViT-L/14, open_clip "ViT-L-14")
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """CLIP visual tower.  Reference builds it via open_clip
    (robot_flamingo/models/factory.py:109-114) with output_tokens=True, i.e.
    the per-patch tokens after the final LayerNorm (un-projected, width-dim)
    are what feeds the perceiver."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    # CLIP ViT uses QuickGELU in the MLP for the OpenAI weights.
    use_quick_gelu: bool = True
    # ToMe token merging: merge `tome_r` patch-token pairs per layer
    # (ops/tome.py; opt-in --vit_tome_r).  0 = exact tower (the default and
    # the reference behavior).  Approximate — validate task success against
    # real checkpoints before production use.
    tome_r: int = 0

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:  # patches + CLS
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# ---------------------------------------------------------------------------
# perceiver resampler (open_flamingo/src/helpers.py:68-132)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PerceiverConfig:
    dim: int = 1024  # = ViT width (vis_dim)
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    ff_mult: int = 4

    @property
    def inner_dim(self) -> int:
        return self.dim_head * self.heads


# ---------------------------------------------------------------------------
# MPT decoder (mosaic_gpt_3b.py / modeling_gpt_9b.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MPTConfig:
    """Truncated MPT decoder.  Unlike the reference — which physically
    deletes layers from the loaded HF module (open_flamingo/src/
    flamingo_lm.py:145-154) — truncation here is just ``n_layers``.

    mpt-1b-redpajama-200b-dolly: d_model 2048, 16 heads, 24 layers, ALiBi.
    mpt-7b: d_model 4096, 32 heads, 32 layers, ALiBi.
    """

    d_model: int = 2048
    n_heads: int = 16
    n_layers: int = 12  # truncated depth (early_exit_layer + 1)
    vocab_size: int = 50432
    max_seq_len: int = 2048
    mlp_ratio: int = 4
    alibi: bool = True
    alibi_bias_max: float = 8.0
    no_bias: bool = True  # MPT removes all linear/LN biases (mosaic_gpt_3b.py:147-153)
    qk_ln: bool = False
    logit_scale: Optional[float] = None
    # 'mpt' (ALiBi, GELU MLP) or 'llama' (RoPE, RMSNorm, SwiGLU) — the llama
    # arch backs the BCFlamingo legacy path (factory.py:161-162)
    arch: str = "mpt"
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# ---------------------------------------------------------------------------
# action head (robot_flamingo/models/action_head.py:408-611)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HeadConfig:
    in_features: int = 2048  # LLM d_model
    hidden_size: int = 1024
    out_features: int = 6  # arm dof
    lstm_num_layers: int = 4
    lstm_layernorm: bool = False
    mlp_layernorm: bool = False
    mlp_num_hidden_layers: int = 3
    mlp_hidden_dims: Tuple[int, ...] = (1024, 512, 256)
    dropout: float = 0.0  # exit head MLP dropout (exit_dropout flag)
    lstm_dropout: float = 0.0  # between LSTM layers (policy_rnn_dropout_p)
    dropout_mode: str = "layerwise"  # or 'last'
    window_size: int = 12
    multi_step_action: int = 1
    pooling: str = "max"  # max-pool over language tokens (action_head.py:520)
    use_state: bool = False
    fusion_mode: str = "post"
    last_action: bool = False


# ---------------------------------------------------------------------------
# full DeeR flamingo policy
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DeerConfig:
    """MPTFlamingo equivalent (robot_flamingo/models/flamingo_mpt.py:17)."""

    vit: ViTConfig = field(default_factory=ViTConfig)
    perceiver: PerceiverConfig = field(default_factory=PerceiverConfig)
    mpt: MPTConfig = field(default_factory=MPTConfig)
    head: HeadConfig = field(default_factory=HeadConfig)

    # x-attn placement: every n-th decoder layer gets a gated cross-attn
    # block (flamingo_lm.py:171-180: layer_idx+1 % n == 0).
    cross_attn_every_n_layers: int = 1
    only_attend_immediate_media: bool = True
    xattn_dim_head: int = 64
    xattn_heads: int = 8
    xattn_ff_mult: int = 4

    # text
    text_len: int = 32
    media_token_id: int = 50277  # placeholder; real ids come from tokenizer
    eoc_token_id: int = 50278

    # exits: internal exits at {exit_interval-1, 2*exit_interval-1, ...} < n_layers
    # plus the final layer head (flamingo_mpt.py:239, get_all_exit_idx :268).
    multi_exit: bool = True
    share_exit: bool = False
    exit_interval: int = 2
    window_size: int = 12

    # action-head family (reference decoder_type/head_type routing,
    # flamingo_mpt.py:149-182, factory.py:89,193):
    #   'deterministic' — LSTM DeterministicDecoder (default)
    #   'fc'            — FCDecoder (requires use_hist or vit_concat fusion,
    #                     flamingo_mpt.py:157-165)
    #   'gpt'           — GPTDecoder with a GPT-2 temporal backbone
    #   'diffusion'     — LSTM feature extractor + conditional 1-D U-Net
    #                     DDPM sampler (DiffusionDecoder, action_head.py:848)
    head_type: str = "deterministic"
    # GPTDecoder backbone width override (--hidden_size,
    # train_calvin_post_strategy.py; None = head.in_features)
    gpt_hidden_size: Optional[int] = None
    # diffusion head hyperparameters (train_calvin_post_strategy.py:189-203:
    # --n_timesteps 150, --n_obs_steps 6, --diff_horizon 32)
    diff_horizon: int = 32
    diff_timesteps: int = 150
    diff_predict_epsilon: bool = True
    n_obs_steps: int = 6
    # U-Net channel ladder (unets.py down_dims default [256,512,1024]);
    # shrink for tiny/test configs
    diff_down_dims: Tuple[int, ...] = (256, 512, 1024)

    # fusion of the two cameras (flamingo_mpt.py:585-777):
    #   'post' (default) — concat each camera's perceiver latents on the
    #       token dim (:609-668)
    #   'pre' — concat ViT tokens on the token dim, ONE perceiver (:585-607)
    #   'two_way' — the MPT forward encodes the static camera only
    #       (flamingo_mpt.py:375; the batch-doubled protocol is BCFlamingo's)
    #   'vit_concat' — per-frame latents concatenated across the window into
    #       one media set per trajectory; text/labels are per-window, not
    #       per-frame (:742-777, train_utils.py:240-279)
    fusion_mode: str = "post"
    # history variant (--use_hist): learned per-frame embeddings added to the
    # ViT tokens before the perceiver; last-step-only action labels
    # (flamingo_mpt.py:700-740, train_utils.py:277)
    use_hist: bool = False
    use_gripper: bool = True
    # native-resolution gripper tower (--gripper_res, opt-in): run the wrist
    # camera through the shared ViT at this input size (e.g. CALVIN's native
    # 84) instead of upsampling to vit.image_size, with position embeddings
    # interpolated to the grid (vit.resize_pos_embed).  The reference's 224
    # upsample exists only because its CLIP preprocess is fixed-res
    # (factory.py:109-114) — at 84 the gripper pass costs (6/16)^2 ~ 14% of
    # the static tower, cutting dual-camera vision FLOPs ~43%.  0 = off
    # (exact parity).  Must be a multiple of vit.patch_size.  Weight-free:
    # can be enabled at serving time on any checkpoint, but training with it
    # on is recommended before production (input distribution shifts).
    gripper_res: int = 0
    use_state: bool = False
    state_dim: int = 15
    # --clip_state: keep only arm pose (6) + gripper (1) of the 15-dim
    # proprio vector (train_utils.py:253-255)
    clip_state: bool = False
    sep_resampler: bool = False
    sep_lm_head: bool = True
    # freeze-policy ablation knobs (reference factory.py:203-237, flags on
    # train_calvin_post_strategy.py) — consumed by trainable_mask:
    freeze_embed: bool = False    # keep token embeddings frozen
    freeze_sampler: bool = False  # keep the perceiver resampler(s) frozen
    unfreeze_vit: bool = False    # train the ViT vision encoder
    # >=0: unfreeze only the LAST round(train_params/140) gated x-attn
    # layers (the reference's param-count budget, factory.py:214-222;
    # 140 = its param_per_layer constant). -1 = all x-attn layers train.
    train_params: int = -1
    layerwise_exit_eval: bool = False
    early_exit_layer: int = -1  # kept for parity bookkeeping; mpt.n_layers is truth
    # rematerialize each decoder layer in the backward pass (activation
    # memory ~ O(1) in depth; the reference's gradient-checkpointing flag,
    # flamingo_lm.py:21-25)
    remat_layers: bool = False
    # remat granularity when remat_layers: 'full' recomputes everything in
    # the layer; 'dots' saves matmul outputs (jax.checkpoint_policies
    # dots_with_no_batch_dims_saveable) — recomputes only the cheap
    # elementwise ops, trading some activation memory for backward FLOPs
    remat_policy: str = "full"

    dtypes: DTypePolicy = field(default_factory=lambda: BF16)

    # -- derived -----------------------------------------------------------
    @property
    def vis_dim(self) -> int:
        return self.vit.width

    @property
    def lang_dim(self) -> int:
        return self.mpt.d_model

    @property
    def n_layers(self) -> int:
        return self.mpt.n_layers

    def exit_layer_ids(self) -> Tuple[int, ...]:
        """Internal exit layer indices (keys of lm_exits), not incl. final.

        flamingo_mpt.py:239: range(exit_interval-1, early_exit_layer, interval)
        where early_exit_layer == n_layers-1 after truncation.

        Layer 0 can never be an exit (the exit criterion needs a pseudo
        action from the layer below, value_net.py:121-126 asserts
        0 not in exit_list), so exit_interval=1 (every-layer ablation)
        starts at layer 1.
        """
        start = max(self.exit_interval - 1, 1)
        return tuple(range(start, self.n_layers - 1, self.exit_interval))

    def all_exit_ids(self) -> Tuple[int, ...]:
        """Internal exits + final layer (flamingo_mpt.py:268-270)."""
        return self.exit_layer_ids() + (self.n_layers - 1,)

    @property
    def num_exits(self) -> int:
        return len(self.all_exit_ids())

    def has_xattn(self, layer_idx: int) -> bool:
        return (layer_idx + 1) % self.cross_attn_every_n_layers == 0

    @property
    def num_media_tokens(self) -> int:
        """Media tokens the LM cross-attends to, by fusion mode:
        post = 2n per frame (flamingo_mpt.py:661), pre/two_way = n,
        vit_concat = 2n x window per trajectory; + 1 if use_state."""
        n = self.perceiver.num_latents
        if self.fusion_mode == "vit_concat":
            n *= (2 if self.use_gripper else 1) * self.window_size
        elif self.use_gripper and self.fusion_mode == "post":
            n *= 2
        if self.use_state:
            n += 1
        return n

    # -- serialization ------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "DeerConfig":
        raw = json.loads(s)
        raw["vit"] = ViTConfig(**raw["vit"])
        raw["perceiver"] = PerceiverConfig(**raw["perceiver"])
        raw["mpt"] = MPTConfig(**raw["mpt"])
        hd = raw["head"]
        hd["mlp_hidden_dims"] = tuple(hd["mlp_hidden_dims"])
        raw["head"] = HeadConfig(**hd)
        raw["dtypes"] = DTypePolicy(**raw["dtypes"])
        if "diff_down_dims" in raw:
            raw["diff_down_dims"] = tuple(raw["diff_down_dims"])
        return DeerConfig(**raw)


# ---------------------------------------------------------------------------
# registry — mirrors mpt_dict (robot_flamingo/models/factory.py:13-26)
# ---------------------------------------------------------------------------


def deer_3b(max_layer: int = 12, exit_interval: int = 2, window_size: int = 12,
            dtypes: DTypePolicy = BF16) -> DeerConfig:
    """OpenFlamingo-3B: ViT-L/14 + MPT-1B(dolly), x-attn every layer."""
    return DeerConfig(
        vit=ViTConfig(),
        perceiver=PerceiverConfig(dim=1024),
        mpt=MPTConfig(d_model=2048, n_heads=16, n_layers=max_layer),
        head=HeadConfig(in_features=2048, window_size=window_size),
        cross_attn_every_n_layers=1,
        exit_interval=exit_interval,
        window_size=window_size,
        dtypes=dtypes,
    )


def deer_9b(max_layer: int = 12, exit_interval: int = 4, window_size: int = 12,
            dtypes: DTypePolicy = BF16) -> DeerConfig:
    """OpenFlamingo-9B: ViT-L/14 + MPT-7B, x-attn every 4 layers."""
    return DeerConfig(
        vit=ViTConfig(),
        perceiver=PerceiverConfig(dim=1024),
        mpt=MPTConfig(d_model=4096, n_heads=32, n_layers=max_layer, vocab_size=50432),
        head=HeadConfig(in_features=4096, window_size=window_size),
        cross_attn_every_n_layers=4,
        exit_interval=exit_interval,
        window_size=window_size,
        dtypes=dtypes,
    )


def bc_llama(n_layers: int = 32, d_model: int = 4096, window_size: int = 12,
             dtypes: DTypePolicy = BF16) -> DeerConfig:
    """BCFlamingo legacy config (llama LM, no early exits,
    robot_flamingo/models/flamingo_bc.py:10)."""
    return DeerConfig(
        vit=ViTConfig(),
        perceiver=PerceiverConfig(dim=1024),
        mpt=MPTConfig(d_model=d_model, n_heads=d_model // 128,
                      n_layers=n_layers, vocab_size=32000, arch="llama",
                      alibi=False),
        head=HeadConfig(in_features=d_model, window_size=window_size),
        cross_attn_every_n_layers=4,
        multi_exit=False,
        window_size=window_size,
        dtypes=dtypes,
    )


def deer_tiny(n_layers: int = 4, exit_interval: int = 2, window_size: int = 4,
              dtypes: DTypePolicy = FP32) -> DeerConfig:
    """Small config for CPU tests: same topology, tiny dims."""
    return DeerConfig(
        vit=ViTConfig(image_size=28, patch_size=14, width=64, layers=2, heads=4),
        perceiver=PerceiverConfig(dim=64, depth=2, dim_head=16, heads=4, num_latents=8),
        mpt=MPTConfig(d_model=64, n_heads=4, n_layers=n_layers, vocab_size=128,
                      max_seq_len=64),
        head=HeadConfig(in_features=64, hidden_size=32, lstm_num_layers=2,
                        mlp_hidden_dims=(32, 16), mlp_num_hidden_layers=2,
                        window_size=window_size),
        cross_attn_every_n_layers=1,
        exit_interval=exit_interval,
        text_len=8,
        media_token_id=125,
        eoc_token_id=126,
        window_size=window_size,
        dtypes=dtypes,
    )


MODEL_REGISTRY = {
    "mpt_dolly_3b": deer_3b,
    "mpt_9b": deer_9b,
    "llama_9b": bc_llama,
    "tiny": deer_tiny,
}
