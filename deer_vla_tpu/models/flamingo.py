"""DeerVLA — the full policy model (MPTFlamingo equivalent,
robot_flamingo/models/flamingo_mpt.py:17-517), assembled functionally.

Structure:
  vision (ViT-L, frozen) x2 cameras -> perceiver resampler (shared unless
  sep_resampler) -> media latents concat on token dim ('post' fusion,
  flamingo_mpt.py:609-668) -> truncated MPT decoder with gated x-attn ->
  exit-head registry {layer_id: head} + final head + shared extra exit.

Functional-state rules:
  * conditioned vision latents are ARGUMENTS (`media`), not module attributes
    (replaces condition_vis_x side-channel, flamingo_mpt.py:665-666)
  * LSTM carries are explicit (see action_head.head_step)
  * train/inference window modes are two entry points over shared params.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.action_head import HeadOutput
from deer_vla_tpu.models.mpt import (decoder_forward, decoder_segment_forward,
                                     embed_tokens, init_decoder)
from deer_vla_tpu.models.perceiver import (init_perceiver, perceiver_forward,
                                           perceiver_forward_stacked)
from deer_vla_tpu.models.vit import init_vit, vit_forward, vit_forward_stacked
from deer_vla_tpu.ops.layers import init_linear, linear


class TrainOutputs(NamedTuple):
    """Per-exit head outputs for the multi-exit loss
    (ordering matches train_utils.py:503: internal exits..., final, extra1, extra2)."""
    exit_outputs: Tuple[HeadOutput, ...]
    final_output: HeadOutput
    extra_output: HeadOutput
    extra_output2: HeadOutput
    hidden_states: jnp.ndarray      # (L, B*W, S, D)
    rand_layer_feat: jnp.ndarray    # (B*W, S, D) sampling-1 features
    rand_layer_ids: jnp.ndarray     # (B, W) sampled layer indices


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_deer(key, cfg: DeerConfig) -> dict:
    from deer_vla_tpu.models.heads import check_head_type, init_any_head
    check_head_type(cfg)
    pdt = cfg.dtypes.pdt
    k = jax.random.split(key, 8 + cfg.num_exits)
    params = {
        "vit": init_vit(k[0], cfg.vit, pdt),
        "perceiver": init_perceiver(k[1], cfg.perceiver, pdt),
        "decoder": init_decoder(k[2], cfg, pdt),
        # heads routed by cfg.head_type (flamingo_mpt.py:149-182)
        "lm_head": init_any_head(k[3], cfg, pdt),   # final-layer exit head
        "extra_exit": init_any_head(k[4], cfg, pdt),
        "lm_exits": {},
    }
    if cfg.head_type == "diffusion":
        # one model-level DDPM U-Net shared by all exits (the reference's
        # single self.diffusion_model, flamingo_mpt.py:168-176) plus the
        # LinearNormalizer affine (fit from data by the trainer,
        # train_calvin_post_strategy.py:457-461; identity until fit)
        from deer_vla_tpu.models.diffusion import init_unet
        from deer_vla_tpu.models.heads import diffusion_head_config
        adim = cfg.head.out_features + 1
        params["diffusion"] = {
            # fold_in keeps every pre-existing init stream byte-identical
            "unet": init_unet(jax.random.fold_in(key, 777),
                              diffusion_head_config(cfg), pdt),
            "norm": {"scale": jnp.ones((adim,), jnp.float32),
                     "offset": jnp.zeros((adim,), jnp.float32)},
        }
    if cfg.sep_resampler:
        params["perceiver_gripper"] = init_perceiver(k[5], cfg.perceiver, pdt)
    if cfg.use_state:
        params["state_fc"] = init_linear(k[6], cfg.state_dim, cfg.vis_dim,
                                         bias=True, dtype=pdt)
    if cfg.use_hist:
        # learned per-frame embedding added to ViT tokens pre-perceiver
        # (flamingo_mpt.py:138, :718-719)
        params["frame_embs"] = jax.random.normal(
            jax.random.fold_in(k[6], 1), (cfg.window_size, cfg.vis_dim), pdt)
    if cfg.multi_exit and not cfg.share_exit:
        for j, layer_id in enumerate(cfg.exit_layer_ids()):
            params["lm_exits"][str(layer_id)] = init_any_head(k[7 + j], cfg, pdt)
    if cfg.share_exit:
        # sharing is resolved at USE time (resolve_head): storing the same
        # dict under several keys would flatten into INDEPENDENT leaves and
        # silently untie after the first optimizer update
        del params["extra_exit"]
    return params


# ---------------------------------------------------------------------------
# vision path
# ---------------------------------------------------------------------------


def encode_vision(params: dict, vision_rgb: jnp.ndarray,
                  vision_gripper: Optional[jnp.ndarray], cfg: DeerConfig,
                  state_tensor: Optional[jnp.ndarray] = None,
                  stacked: Optional[dict] = None,
                  window_size: int = 1) -> jnp.ndarray:
    """Camera fusion (flamingo_mpt.py:585-777), routed by cfg.fusion_mode:

      'post' (default): each camera -> perceiver, latents concat on the
          token dim -> (B, T, 2n(+1), vis_dim)          [:609-668]
      'pre': ViT tokens concat on the token dim, ONE perceiver ->
          (B, T, n(+1), vis_dim)                        [:585-607]
      'two_way': static camera only (the MPT forward's routing, :375)
      'vit_concat': per-frame latents window-concatenated per trajectory:
          batch rows are B*window frames in, (B, T, 2n*window(+1), d) out
          [_encode_history_vision_fc_post :742-777]

    cfg.use_hist additionally adds the learned frame embedding to each
    window frame's ViT tokens before the perceiver (:700-740); batch rows
    stay per-frame (B*window in and out).

    The ViT runs under stop_gradient (frozen, torch.no_grad at
    flamingo_mpt.py:573-580).

    stacked (serving path): {"vit": ..., "perceiver": ...[, "perceiver_
    gripper": ...]} pre-stacked layer pytrees — same math as the list
    forwards but ~10x fewer argument leaves per dispatch (see
    vit.stack_vit_blocks).
    """
    tok_rgb, tok_grip = dual_camera_tokens(params, vision_rgb,
                                           vision_gripper, cfg, stacked)
    return fuse_vision_tokens(params, tok_rgb, tok_grip, cfg, state_tensor,
                              stacked, window_size)


def dual_camera_tokens(params: dict, vision_rgb: jnp.ndarray,
                       vision_gripper: Optional[jnp.ndarray], cfg: DeerConfig,
                       stacked: Optional[dict] = None):
    """Camera -> ViT-token routing shared by encode_vision and the engines'
    per-frame encode (eval/scan_policy.encode_frame).

    Same-resolution cameras share the ViT as ONE doubled batch (2x MXU
    utilization at small batch; the reference runs two sequential encoder
    passes, flamingo_mpt.py:626-659).  With cfg.gripper_res the gripper
    frames arrive at their NATIVE resolution (CALVIN renders the wrist
    camera at 84x84; the reference upsamples to 224 only because its CLIP
    preprocess is fixed-res) — the shared tower then runs each camera as
    its own pass with position embeddings interpolated to the grid
    (vit.resize_pos_embed), cutting the gripper tower to (g/16)^2 of the
    static cost."""
    grip_on = (cfg.use_gripper and vision_gripper is not None
               and cfg.fusion_mode != "two_way")
    if not grip_on:
        return vision_tokens(params, vision_rgb, cfg, stacked), None
    same_res = vision_gripper.shape[-2:] == vision_rgb.shape[-2:]
    if same_res and (cfg.fusion_mode == "pre" or not cfg.sep_resampler):
        both = jnp.concatenate([vision_rgb, vision_gripper], axis=0)
        tok = vision_tokens(params, both, cfg, stacked)
        b = vision_rgb.shape[0]
        return tok[:b], tok[b:]
    return (vision_tokens(params, vision_rgb, cfg, stacked),
            vision_tokens(params, vision_gripper, cfg, stacked))


def vision_tokens(params: dict, v: jnp.ndarray, cfg: DeerConfig,
                  stacked: Optional[dict] = None) -> jnp.ndarray:
    """ViT forward -> frozen token grid (B, T, F, v, d).

    Per-frame and window-position-INDEPENDENT (use_hist frame embeddings
    are added in fuse_vision_tokens), so these tokens are cacheable per
    frame for window-folded serving: a rolling token queue re-encodes only
    the newest frame (the reference's feature_cache idea,
    eval_utils.py:371; see eval/caching.FrameCachePolicy)."""
    stacked = stacked or {}
    b, t, f = v.shape[:3]
    flat = v.reshape((b * t * f,) + v.shape[3:]).astype(cfg.dtypes.cdt)
    if cfg.vit.tome_r > 0 and flat.shape[-2:] != (cfg.vit.image_size,
                                                  cfg.vit.image_size):
        # native-res gripper pass under ToMe: the merge schedule is sized
        # for the static camera's token count; the (much smaller) gripper
        # grid runs the exact tower instead
        _, tokens = (vit_forward_stacked(params["vit"], stacked["vit"],
                                         flat, cfg.vit)
                     if "vit" in stacked
                     else vit_forward(params["vit"], flat, cfg.vit))
    elif cfg.vit.tome_r > 0:
        # ToMe token merging (ops/tome.py): fewer tokens per layer, exact
        # when tome_r == 0 — the perceiver consumes tokens as a set, so the
        # shorter token list flows through every fusion mode unchanged
        from deer_vla_tpu.models.vit import vit_forward_tome
        _, tokens = vit_forward_tome(params["vit"], flat, cfg.vit,
                                     stacked.get("vit"))
    elif "vit" in stacked:
        _, tokens = vit_forward_stacked(params["vit"], stacked["vit"], flat,
                                        cfg.vit)
    else:
        _, tokens = vit_forward(params["vit"], flat, cfg.vit)
    if not cfg.unfreeze_vit:
        # the reference ALWAYS encodes vision under torch.no_grad
        # (flamingo_mpt.py:573) — which makes its own --unfreeze_vit dead in
        # the calvin pipeline; here the flag does what it says and lets
        # gradients reach the ViT (trainable_mask marks it trainable too)
        tokens = jax.lax.stop_gradient(tokens)
    return tokens.reshape(b, t, f, tokens.shape[-2], tokens.shape[-1])


def fuse_vision_tokens(params: dict, tok_rgb: jnp.ndarray,
                       tok_grip: Optional[jnp.ndarray], cfg: DeerConfig,
                       state_tensor: Optional[jnp.ndarray] = None,
                       stacked: Optional[dict] = None,
                       window_size: int = 1) -> jnp.ndarray:
    """frame embeddings + perceiver resample + fusion fold + state token,
    from (possibly cached) ViT tokens.  encode_vision == fuse_vision_tokens
    on vision_tokens output; split so window-folded serving can cache the
    dominant per-frame ViT work and re-run only this cheap tail."""
    cdt = cfg.dtypes.cdt
    stacked = stacked or {}

    def run_perceiver(pkey, tok):
        if pkey in stacked:
            return perceiver_forward_stacked(params[pkey], stacked[pkey],
                                             tok, cfg.perceiver)
        return perceiver_forward(params[pkey], tok, cfg.perceiver)

    def add_frame_embs(tokens):
        if cfg.use_hist and "frame_embs" in params:
            # (B*W, T, F, v, d) + frame_embs[w] per window position
            # (flamingo_mpt.py:713-721)
            b = tokens.shape[0]
            fe = params["frame_embs"].astype(tokens.dtype)[:window_size]
            fe = jnp.tile(fe, (b // window_size, 1))  # (B*W, d)
            tokens = tokens + fe[:, None, None, None, :]
        return tokens

    def window_concat(lat):
        """(B*W, T, n, d) -> (B, T, n*W, d): fold the window into the media
        token dim (train_utils.py:279 lang is per-window in this mode)."""
        bw, t, n, d = lat.shape
        lat = lat.reshape(bw // window_size, window_size, t, n, d)
        return lat.transpose(0, 2, 1, 3, 4).reshape(
            bw // window_size, t, window_size * n, d)

    tok_rgb = add_frame_embs(tok_rgb)
    if tok_grip is not None:
        tok_grip = add_frame_embs(tok_grip)

    if tok_grip is None:
        lat = run_perceiver("perceiver", tok_rgb)
        if cfg.fusion_mode == "vit_concat":
            lat = window_concat(lat)
        media = lat
    elif cfg.fusion_mode == "pre":
        # ViT tokens of both cameras concat on the token axis -> ONE
        # perceiver resample over the union (flamingo_mpt.py:596-601)
        media = run_perceiver("perceiver",
                              jnp.concatenate([tok_rgb, tok_grip], axis=3))
    elif cfg.fusion_mode == "vit_concat":
        if cfg.sep_resampler:
            rgb_lat = run_perceiver("perceiver", tok_rgb)
            grip_lat = run_perceiver("perceiver_gripper", tok_grip)
        elif tok_rgb.shape[3] != tok_grip.shape[3]:
            # native-res gripper: token counts differ, so the shared
            # resampler runs per camera (identical math to the doubled
            # batch; latent count is fixed so the fold below is unchanged)
            rgb_lat = run_perceiver("perceiver", tok_rgb)
            grip_lat = run_perceiver("perceiver", tok_grip)
        else:
            # shared resampler: one doubled-batch pass
            lat = run_perceiver("perceiver",
                                jnp.concatenate([tok_rgb, tok_grip], axis=0))
            b = tok_rgb.shape[0]
            rgb_lat, grip_lat = lat[:b], lat[b:]
        media = jnp.concatenate([window_concat(rgb_lat),
                                 window_concat(grip_lat)], axis=2)
    elif not cfg.sep_resampler:
        if tok_rgb.shape[3] != tok_grip.shape[3]:
            # 'post' + native-res gripper: per-camera shared-resampler passes
            media = jnp.concatenate([run_perceiver("perceiver", tok_rgb),
                                     run_perceiver("perceiver", tok_grip)],
                                    axis=2)
        else:
            # 'post': shared resampler, doubled batch, latents concat on
            # tokens
            lat = run_perceiver("perceiver",
                                jnp.concatenate([tok_rgb, tok_grip], axis=0))
            b = tok_rgb.shape[0]
            media = jnp.concatenate([lat[:b], lat[b:]], axis=2)
    else:
        rgb_lat = run_perceiver("perceiver", tok_rgb)
        grip_lat = run_perceiver("perceiver_gripper", tok_grip)
        media = jnp.concatenate([rgb_lat, grip_lat], axis=2)
    if cfg.use_state and state_tensor is not None and "state_fc" in params:
        st_in = state_tensor
        if cfg.fusion_mode == "vit_concat" and window_size > 1:
            # media is per-trajectory in this mode: use the last frame's
            # proprio state (the action target is the last step's)
            st_in = state_tensor.reshape(
                (-1, window_size) + state_tensor.shape[1:])[:, -1]
        st = linear(params["state_fc"], st_in.astype(cdt))
        media = jnp.concatenate([media, st], axis=2)
    return media


# ---------------------------------------------------------------------------
# training forward (all exits)
# ---------------------------------------------------------------------------


def forward_train(params: dict, vision_x: jnp.ndarray, lang_x: jnp.ndarray,
                  attention_mask: jnp.ndarray, cfg: DeerConfig, rng,
                  vision_gripper: Optional[jnp.ndarray] = None,
                  state_tensor: Optional[jnp.ndarray] = None,
                  no_backbone_grad: bool = False,
                  only_extra_exit: bool = False,
                  train: bool = True) -> TrainOutputs:
    """Flamingo training forward (flamingo_mpt.py:308-517).

    Shapes (after the loader flattens batch x window):
      vision_x, vision_gripper: (B*W, 1, 1, 3, H, W)
      lang_x, attention_mask:   (B*W, S)
      state_tensor:             (B*W, 1, 1, state_dim) or None

    fusion_mode 'vit_concat': lang_x/attention_mask are PER-WINDOW (B, S)
    while vision stays per-frame (train_utils.py:240-251) — the decoder runs
    batch B with the window folded into the media token dim, and heads see
    window 1 (one action per trajectory; labels take the last step).
    """
    w = cfg.window_size
    if cfg.fusion_mode == "vit_concat":
        w = 1
    # media: (B*W, T_img=1, tokens, d) — each frame is its own batch row, so
    # T_img stays 1 and the x-attn media-time mask sees one image per row.
    # (vit_concat: (B, 1, 2n*W, d) — one media set per trajectory.)
    media = encode_vision(params, vision_x, vision_gripper, cfg, state_tensor,
                          window_size=cfg.window_size)

    hidden, _ = decoder_forward(params["decoder"], lang_x, attention_mask,
                                media, cfg)
    if no_backbone_grad:
        hidden = jax.lax.stop_gradient(hidden)

    st = state_tensor.reshape(-1, state_tensor.shape[-1]) if state_tensor is not None else None
    if st is not None and cfg.fusion_mode == "vit_concat":
        # heads run batch B (window folded into media): last frame's state
        st = st.reshape(-1, cfg.window_size, st.shape[-1])[:, -1]
    rngs = jax.random.split(rng, 8)

    def run_head(head_params, feat, drng):
        # routed by cfg.head_type; for 'diffusion' the return value is the
        # (B, W, hidden) LSTM feature tensor, not a HeadOutput (the DDPM
        # loss consumes features, train/losses.multi_exit_diffusion_loss)
        from deer_vla_tpu.models.heads import any_head_forward
        return any_head_forward(head_params, feat, cfg, st,
                                window=w, dropout_rng=drng, train=train)

    final_out = run_head(params["lm_head"], hidden[-1], rngs[0])

    exit_outputs = ()
    if cfg.multi_exit and not only_extra_exit:
        exit_outputs = tuple(
            run_head(params["lm_head"] if cfg.share_exit
                     else params["lm_exits"][str(i)],
                     hidden[i], jax.random.fold_in(rngs[1], i))
            for i in cfg.exit_layer_ids())

    # -- extra-exit random-layer sampling (flamingo_mpt.py:476-512) ----------
    exit_ids = jnp.asarray(cfg.all_exit_ids())
    n_exit = cfg.num_exits
    bsw = hidden.shape[1]
    bs = bsw // w
    # (B*W, L, S, D) view for gathering
    feats_bw = jnp.swapaxes(hidden, 0, 1)

    # Sampling strategy 1: independent exit per (b, t)
    idx1 = jax.random.randint(rngs[2], (bs, w), 0, n_exit)
    lay1 = exit_ids[idx1]  # (B, W)
    extra_head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
    rand_feat = jnp.take_along_axis(
        feats_bw, lay1.reshape(bsw, 1, 1, 1), axis=1).squeeze(1)  # (B*W, S, D)
    extra_out = run_head(extra_head, rand_feat, rngs[3])

    # Sampling strategy 2: one switch point, two exits per trajectory
    prev_len = jax.random.randint(rngs[4], (), 1, w + 1)
    idx2 = jax.random.randint(rngs[5], (bs, 2), 0, n_exit)
    tpos = jnp.arange(w)[None, :]
    pick = jnp.where(tpos < prev_len, idx2[:, :1], idx2[:, 1:])  # (B, W)
    lay2 = exit_ids[pick]
    feat2 = jnp.take_along_axis(
        feats_bw, lay2.reshape(bsw, 1, 1, 1), axis=1).squeeze(1)
    extra_out2 = run_head(extra_head, feat2, rngs[6])

    return TrainOutputs(exit_outputs, final_out, extra_out, extra_out2,
                        hidden, rand_feat, lay1)


# ---------------------------------------------------------------------------
# fixed-exit inference forward (exit_id path, flamingo_mpt.py:446-461)
# ---------------------------------------------------------------------------


def forward_fixed_exit(params: dict, vision_x: jnp.ndarray, lang_x: jnp.ndarray,
                       attention_mask: jnp.ndarray, cfg: DeerConfig,
                       exit_id: int,
                       vision_gripper: Optional[jnp.ndarray] = None,
                       state_tensor: Optional[jnp.ndarray] = None,
                       carry=None) -> Tuple[HeadOutput, object]:
    """Streaming single-frame inference at a fixed exit layer.

    Runs layers [0, exit_id] only (true FLOPs savings — layers above the exit
    are never issued), then the extra-exit head (layerwise_exit_eval=False
    default: 'only use the extra exit for inference', flamingo_mpt.py:450-452).
    Returns (head output, new LSTM carry).
    """
    if exit_id < 0:
        exit_id += cfg.n_layers
    assert 0 <= exit_id < cfg.n_layers, (
        f"exit_id {exit_id} out of range for {cfg.n_layers}-layer decoder")
    media = encode_vision(params, vision_x, vision_gripper, cfg, state_tensor)
    x = embed_tokens(params["decoder"], lang_x, cfg.dtypes.cdt)
    media_locations = lang_x == cfg.media_token_id
    _, x = decoder_segment_forward(params["decoder"], x, attention_mask,
                                   media, cfg, 0, exit_id + 1,
                                   media_locations)
    st = state_tensor.reshape(-1, state_tensor.shape[-1]) if state_tensor is not None else None
    head = resolve_head(params, cfg, exit_id)
    # fp32 head + carry: the LSTM carry persists across the episode; bf16
    # accumulation would drift (matches the policy engines)
    from deer_vla_tpu.models.heads import any_head_step
    return any_head_step(head, x.astype(jnp.float32), carry, cfg, st)


def resolve_head(params: dict, cfg: DeerConfig, exit_id: int) -> dict:
    """Pick the head for an exit (flamingo_mpt.py:450-457).  With
    share_exit, ALL heads are the single lm_head (aliasing param subtrees in
    a pytree would silently untie them after one optimizer update, so
    sharing is resolved at use time instead)."""
    if cfg.share_exit or not cfg.layerwise_exit_eval:
        return params["lm_head"] if cfg.share_exit else params["extra_exit"]
    if exit_id == cfg.n_layers - 1:
        return params["lm_head"]
    return params["lm_exits"][str(exit_id)]


def cast_frozen_to_bf16(params: dict, mask: dict) -> dict:
    """Memory saver for single-chip training: frozen leaves (mask False)
    never receive updates, so they don't need an fp32 master copy — cast
    them to bf16 (the compute dtype).  On a v5e-16GB this is what lets the
    full 3B joint train step fit (the reference needed 8x V100-32GB)."""
    def one(p, m):
        if not m and hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(jnp.bfloat16)
        return p
    return jax.tree_util.tree_map(one, params, mask)


def trainable_mask(params: dict, cfg: DeerConfig, phase: str = "joint") -> dict:
    """Boolean pytree mask of trainable leaves.

    Reference freeze policy (factory.py:203-237): freeze everything, then
    unfreeze gated x-attn, perceiver, token embeddings, lm_head/exits/extra.
    phase='exit_only' additionally freezes the backbone (second post-strategy
    phase, train_calvin_post_strategy.py:644-660).

    Ablation knobs (same factory section): cfg.freeze_sampler keeps the
    perceiver(s) frozen (:223-224), cfg.freeze_embed keeps embeddings
    frozen (:225-226), cfg.unfreeze_vit trains the ViT (:232-233), and
    cfg.train_params>=0 trains only the LAST round(train_params/140)
    gated x-attn layers (:214-222).
    """
    if cfg.train_params >= 0:
        k = int(cfg.train_params / 140 + 0.5)  # reference param_per_layer
        xattn_layers = [i for i in range(cfg.n_layers) if cfg.has_xattn(i)]
        # last min(k, count) x-attn layers (the reference walks backwards
        # until the budget or the list runs out, factory.py:217-222)
        budget = set(xattn_layers[max(0, len(xattn_layers) - k):] if k
                     else [])
    else:
        budget = None

    def label(path_tuple):
        keys = [getattr(e, "key", getattr(e, "idx", getattr(e, "name", None)))
                for e in path_tuple]
        top = keys[0]
        if top == "vit":
            return cfg.unfreeze_vit and phase == "joint"
        if top in ("perceiver", "perceiver_gripper"):
            # under a train_params budget the perceiver stays frozen (the
            # reference unfreezes it only in the -1 branch, factory.py:209-213)
            return (phase == "joint" and not cfg.freeze_sampler
                    and cfg.train_params < 0)
        if top in ("state_fc", "frame_embs"):
            return phase == "joint"
        if top == "decoder":
            if "xattn" in keys:
                if budget is not None:
                    layer = keys[keys.index("xattn") + 1]
                    if layer not in budget:
                        return False
                return phase == "joint"
            if "wte" in keys:
                return phase == "joint" and not cfg.freeze_embed
            if "norm_f" in keys or "lm_head_w" in keys:
                # llama's untied LM output head: trained like the embeddings
                # (upstream trains input+output embeddings; a frozen random
                # lm_head would make LM pretraining learn nothing)
                return phase == "joint"
            return False  # MPT blocks / ln_f stay frozen, as in the reference
        if top in ("lm_head", "extra_exit", "lm_exits"):
            return True
        if top == "diffusion":
            # the DDPM U-Net trains in BOTH phases like the heads
            # (factory.py:232 diffusion_model.requires_grad_(True)); the
            # normalizer affine is a data-fit buffer, never optimized
            return "norm" not in keys
        return False

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: label(path), params)


def checkpoint_mask(params: dict, cfg: DeerConfig) -> dict:
    """Leaves the trainable-delta checkpoint must persist: the joint-phase
    trainable set PLUS non-trained data-fit buffers (the diffusion
    normalizer affine — lost weights would silently rescale every served
    action)."""
    mask = trainable_mask(params, cfg, "joint")
    if "diffusion" in params:
        mask["diffusion"]["norm"] = jax.tree_util.tree_map(
            lambda _: True, params["diffusion"]["norm"])
    return mask
