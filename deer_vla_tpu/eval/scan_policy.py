"""While-loop dynamic-exit engine: ONE compiled program, one-layer body.

The third execution model (SURVEY §7.3 "lax.while_loop over per-layer scan
with an early-exit predicate"), complementing:
  * eval/policy.DeerPolicy       — host-sequenced bucket programs
  * eval/fused_policy            — unrolled lax.cond bucket chain (compiles
                                   slowly at 3B scale: 6 big branches)

Here decoder layers live as STACKED pytrees (L, ...) and a lax.while_loop
runs one layer per iteration; at exit layers a lax.cond evaluates the
speculative head + action delta and sets the stop flag.  The body HLO is a
single layer + head, so compile time is tiny and constant in depth, the
loop stops issuing work at the exit (true FLOPs savings), and the host
dispatches exactly one program per action with runtime thresholds.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import encode_vision, fuse_vision_tokens
from deer_vla_tpu.models.heads import (any_head_forward, any_head_step,
                                       any_zero_carry, head_action_width)
from deer_vla_tpu.models.gated_xattn import gated_xattn_forward
from deer_vla_tpu.models.mpt import embed_tokens, make_attn_bias, \
    mpt_block_forward, mpt_block_forward_stacked
from deer_vla_tpu.ops.lstm import zero_carry


def stack_decoder_layers(params: dict, cfg: DeerConfig,
                         include_encoders: bool = False) -> dict:
    """blocks: list of per-layer dicts -> one pytree with leading L dim;
    xattn likewise (padded index map for every_n > 1).

    The stacked copy is cast to the COMPUTE dtype: each while-loop iteration
    dynamic-slices one layer's weights (a real HBM copy), so a bf16 stack
    halves that traffic — and the matmuls consume bf16 anyway.

    include_encoders additionally stacks the ViT blocks and perceiver
    layers ("vit"/"perceiver"[/"perceiver_gripper"] keys, consumed by
    encode_vision's stacked path): per-program dispatch cost on this runtime
    grows ~1 us per argument leaf (scripts/bench_dispatch_args.py), and the
    encoders are ~400 of the full tree's ~800 leaves."""
    from deer_vla_tpu.ops.layers import stack_layer_tree
    cdt = cfg.dtypes.cdt
    blocks = stack_layer_tree(params["decoder"]["blocks"], cdt)
    xattn_list = [x for x in params["decoder"]["xattn"] if x is not None]
    xattn = stack_layer_tree(xattn_list, cdt)
    has_xattn = np.array([cfg.has_xattn(i) for i in range(cfg.n_layers)])
    xidx = np.zeros(cfg.n_layers, np.int32)
    j = 0
    for i in range(cfg.n_layers):
        xidx[i] = min(j, len(xattn_list) - 1)
        if has_xattn[i]:
            j += 1
    out = {"blocks": blocks, "xattn": xattn,
           "has_xattn": jnp.asarray(has_xattn),
           "xattn_idx": jnp.asarray(xidx)}
    if include_encoders:
        out.update(stack_encoder_layers(params, cdt))
    return out


def prune_encoder_params(params: dict) -> dict:
    """ViT/perceiver non-layer leaves (+ wte, state_fc) — the encode-prefix
    subtree shared by both packed engines; layer weights ride the stacked
    encoder trees instead."""
    vit = {k: v for k, v in params["vit"].items() if k != "blocks"}
    vit["blocks"] = []
    out = {"vit": vit, "decoder": {"wte": params["decoder"]["wte"]}}
    for pk in ("perceiver", "perceiver_gripper"):
        if pk in params:
            p = {k: v for k, v in params[pk].items() if k != "layers"}
            p["layers"] = []
            out[pk] = p
    if "state_fc" in params:
        out["state_fc"] = params["state_fc"]
    if "frame_embs" in params:
        out["frame_embs"] = params["frame_embs"]
    return out


def stack_encoder_layers(params: dict, cdt) -> dict:
    """Stacked ViT blocks + perceiver layers for encode_vision's stacked
    path (shared by both packed engines)."""
    from deer_vla_tpu.models.perceiver import stack_perceiver_layers
    from deer_vla_tpu.models.vit import stack_vit_blocks
    out = {"vit": stack_vit_blocks(params["vit"], cdt)}
    for pk in ("perceiver", "perceiver_gripper"):
        if pk in params:
            out[pk] = stack_perceiver_layers(params[pk], cdt)
    return out


def check_serving_supported(cfg: DeerConfig,
                            allow_window_folded: bool = False,
                            allow_any_head: bool = False) -> None:
    """The serving engines evaluate per-frame media; the use_hist /
    vit_concat TRAINING variants fold the window into the media tokens, so
    silently serving them would feed train/eval-mismatched features (frame
    embedding 0 everywhere; 2n instead of 2nW tokens).  Refuse loudly.

    vit_concat and use_hist ARE served by the while-loop engine
    (allow_window_folded=True): its step folds the rolling frame window into
    the media tokens, fed by eval/rollout's windowed adapter (the
    reference's img_queue protocol, eval_utils.py:344-386)."""
    if cfg.fusion_mode == "vit_concat" and not allow_window_folded:
        raise NotImplementedError(
            "this engine does not serve --fusion_mode vit_concat; use the "
            "while-loop engine (ScanDeerPolicy) with the windowed adapter")
    if cfg.use_hist and not allow_window_folded:
        raise NotImplementedError(
            "this engine does not serve --use_hist; use the while-loop "
            "engine (ScanDeerPolicy) with the windowed adapter (per-frame "
            "text + full-window head, flamingo_mpt.py:700-740)")
    if cfg.use_hist and cfg.fusion_mode == "vit_concat":
        raise NotImplementedError(
            "use_hist + vit_concat combined serving is undefined (per-frame "
            "text vs per-trajectory media); train/serve one or the other")
    if cfg.head_type != "deterministic" and not allow_any_head:
        raise NotImplementedError(
            f"this engine hardcodes the LSTM head; head_type "
            f"{cfg.head_type!r} serves through ScanDeerPolicy or "
            "DeerPolicy (cli.eval routes it automatically)")


def prune_serving_params(params: dict, cfg: DeerConfig) -> dict:
    """Serving argument tree with ONLY the leaves the while-loop step reads:
    the encode-prefix subtree plus the one exit head.  ~800 -> ~60 leaves;
    at ~1 us/leaf marshaling that removes most of the per-dispatch floor."""
    out = prune_encoder_params(params)
    head_key = "lm_head" if cfg.share_exit else "extra_exit"
    out[head_key] = params[head_key]
    return out


def build_scan_step(cfg: DeerConfig, exit_ids: List[int],
                    threshold_type: str = "L2",
                    max_layer: Optional[int] = None,
                    indexed_mm: bool = False):
    """jitted step(params, stacked, img, grip, ids, mask, carry, prev_action,
    has_prev, thresholds_full) where thresholds_full is (n_layers,) with
    +inf at the forced-exit layer and the per-exit thresholds at exit layers
    (non-exit layers -inf => never exit)."""
    from deer_vla_tpu.models.value_net import get_delta

    ml = (max_layer if max_layer is not None else cfg.n_layers) - 1
    exits = [e for e in exit_ids if e <= ml]
    if not exits:
        # the old silent fallback kept exit_ids[0], running PAST the
        # --max_layer FLOPs cap and later KeyError-ing on the controller's
        # empty thresholds dict — fail loudly instead
        raise ValueError(
            f"max_layer={max_layer} sits below the first exit layer "
            f"{exit_ids[0] + 1} (exit ids {list(exit_ids)}); raise "
            "--max_layer or retrain with a smaller exit_interval")
    last_exit = exits[-1]
    is_exit = np.full(cfg.n_layers, False)
    for e in exits:
        is_exit[e] = True
    # uniform exit spacing (the exit_interval grid, flamingo_mpt.py:239) lets
    # the loop advance one SEGMENT per iteration: `stride` layers + one head
    # check, halving (interval=2) or quartering (interval=4) the iteration
    # count and its per-iteration latching/gather overhead
    seg_bounds = [-1] + exits
    seg_lens = {seg_bounds[i + 1] - seg_bounds[i] for i in range(len(exits))}
    uniform = len(seg_lens) == 1
    stride = seg_lens.pop() if uniform else 1
    use_strided = uniform and stride >= 1
    n_segments = len(exits)

    def step(params, stacked, img, grip, ids, mask, carry, thresholds_full,
             state=None):
        """Fully batched: each of the B streams exits independently; the loop
        runs until ALL streams have exited (work for the whole batch stops at
        the SLOWEST stream's exit — the throughput-serving trade; B=1
        degenerates to per-stream exact semantics).

        Exit criterion is purely WITHIN-timestep (value_net.py:120-133): the
        first exit's reference action is ALWAYS the pseudo action from the
        layer below it (the `i - interval < 0` branch is layer-indexed, so it
        triggers every timestep), and each later exit compares against the
        previous exit's action this timestep (action_list[-1]).

        vit_concat serving: img/grip carry B*window frame rows (the rolling
        queue, eval_utils.py:344-386) while ids/mask stay per-stream (B, S);
        encode_vision folds the window into the media tokens.

        use_hist serving: img/grip AND ids/mask carry B*window rows (text
        tiled per frame); the head runs the FULL window (no streamed carry —
        the window IS the memory) and emits the last step\'s action
        (flamingo_mpt.py:700-740, labels[:, [-1]] semantics).

        state (proprio, --use_state models): per-frame rows matching the
        image batch; reaches both the state_fc vision token
        (flamingo.py:198-206) and the head's embed_state
        (action_head.py:524-536).  None for stateless models (fixed per
        rollout, so the one retrace is free)."""
        media, x, mloc = encode(params, stacked, img, grip, ids, state)
        return decode(params, stacked, media, x, mloc, mask, carry,
                      thresholds_full, state)

    enc_w = (cfg.window_size
             if (cfg.fusion_mode == "vit_concat" or cfg.use_hist) else 1)

    def encode(params, stacked, img, grip, ids, state=None):
        """Vision + token-embed prefix; separable so the training-free
        vision cache (eval/caching.py) can skip it on near-identical
        frames."""
        media = encode_vision(params, img, grip, cfg, state, stacked=stacked,
                              window_size=enc_w)
        x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
        mloc = ids == cfg.media_token_id
        return media, x, mloc

    def decode(params, stacked, media, x, mloc, mask, carry,
               thresholds_full, state=None):
        """The dynamic-exit while_loop from pre-encoded (media, x)."""
        attn_bias = make_attn_bias(mask, cfg.mpt, x.dtype)
        head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
        # stream count: text rows, except use_hist where text is per-frame
        b = x.shape[0] // (enc_w if cfg.use_hist else 1)  # enc_w from closure
        is_exit_arr = jnp.asarray(is_exit)
        # multi_step_action k>1: arm width 6k, gripper width k (flat head
        # output, action_head.py:443-444); the exit delta spans the full
        # plan.  Alt heads (models/heads.py routing): the diffusion head's
        # 'action' slot carries the (hidden,) conditioning feature and its
        # gripper slot is a zero scalar (any_head_step contract).
        adim = head_action_width(cfg)
        gdim = (1 if cfg.head_type == "diffusion"
                else cfg.head.multi_step_action)

        # head-side proprio rows: use_hist heads consume the full per-frame
        # window; vit_concat heads take the LAST frame's row (training
        # slices the same way, flamingo.py vit_concat branch)
        hstate = state
        if (state is not None and enc_w > 1
                and cfg.fusion_mode == "vit_concat"):
            hstate = state.reshape((b, enc_w) + state.shape[1:])[:, -1]

        if cfg.use_hist:
            def eval_head(x_in):
                o = any_head_forward(head, x_in.astype(jnp.float32), cfg,
                                     hstate, window=enc_w, last_action=True)
                if cfg.head_type == "diffusion":
                    # features (B, 1, hidden), no gripper, carry untouched
                    arm = o[:, 0].astype(jnp.float32)
                    return arm, jnp.zeros((arm.shape[0], 1), jnp.float32), \
                        carry
                return o.actions[:, 0].astype(jnp.float32), \
                    o.gripper_probs[:, 0].astype(jnp.float32), carry
        else:
            def eval_head(x_in):
                out, cand = any_head_step(head, x_in.astype(jnp.float32),
                                          carry, cfg, hstate)
                return out.actions[:, 0].astype(jnp.float32), \
                    out.gripper_probs[:, 0].astype(jnp.float32), cand

        def mask_carry(take, cand, best):
            """Per-stream carry commit for the chosen exit.  The carry
            layout is head-type specific (models/heads.any_zero_carry):
            LSTM-style tuples of (L, B, H) for deterministic/diffusion,
            GPTCarry(buffer (B, W, D), count (B,)) for gpt (every
            candidate advances every stream's count by exactly one this
            timestep, so the candidate's counts are correct for taken and
            not-yet-taken streams alike), () for fc."""
            if cfg.head_type == "fc":
                return best
            if cfg.head_type == "gpt":
                buf = jnp.where(take[:, None, None], cand[0], best[0])
                return type(cand)(buf, cand[1])
            return tuple(jnp.where(take[None, :, None], c, bc)
                         for c, bc in zip(cand, best))

        use_imm = indexed_mm and cfg.mpt.arch == "mpt"

        def run_layer(i, x):
            """Returns (layer input == hidden_states[i-1], layer output).
            The first element feeds the first-exit pseudo action — the
            reference uses feats[i-1], the PREVIOUS FlamingoLayer's output
            (value_net.py:125), i.e. before this layer's x-attn."""
            x_in = x
            xat = jax.tree_util.tree_map(lambda s: s[stacked["xattn_idx"][i]],
                                         stacked["xattn"])

            def apply_x(x):
                return gated_xattn_forward(
                    xat, x, media, mloc, heads=cfg.xattn_heads,
                    dim_head=cfg.xattn_dim_head,
                    only_attend_immediate_media=cfg.only_attend_immediate_media)

            if cfg.cross_attn_every_n_layers == 1:
                # x-attn on EVERY layer (the 3B config): skip the per-
                # iteration lax.cond, it would always take the true branch
                x = apply_x(x)
            else:
                x = jax.lax.cond(stacked["has_xattn"][i], apply_x,
                                 lambda x: x, x)
            if use_imm:
                # big weights stream HBM->MXU (indexed_matmul) instead of a
                # dynamic-slice of the whole layer per iteration.  Measured
                # on v5e (3B and 9B dims): parity with the XLA slice path
                # (XLA fuses the slice into the dots, no materialization),
                # so this stays opt-in — revisit if a profile shows slice
                # copies on other shapes/toolchains.
                return x_in, mpt_block_forward_stacked(stacked["blocks"], i,
                                                       x, attn_bias, cfg.mpt)
            blk = jax.tree_util.tree_map(lambda s: s[i], stacked["blocks"])
            return x_in, mpt_block_forward(blk, x, attn_bias, cfg.mpt)

        def do_check(i, is_first, x, x_prev, done, ref):
            """Speculative head + delta at exit layer i (traced scalars).

            is_first (traced bool): at the FIRST exit the reference action is
            the pseudo action from the layer below — EVERY timestep
            (value_net.py:121-126, layer-indexed condition); later exits
            compare against the previous exit's action this timestep."""
            arm, grip, cand = eval_head(x)

            def pseudo(_):
                pa, _, _ = eval_head(x_prev)
                return pa

            ref_k = jax.lax.cond(is_first, pseudo, lambda _: ref, None)
            delta = get_delta(arm, ref_k, threshold_type)  # (B,)
            # thresholds_full: (n_layers,) shared, or (B, n_layers) for
            # per-stream thresholds (multi-candidate batched serving /
            # parallel BO) — [..., i] covers both layouts
            take = (~done) & (delta <= thresholds_full[..., i])
            return arm, grip, cand, take, jnp.where(done[:, None], ref, arm)

        def commit(state_vals, arm, grip, cand, take, i):
            best_arm, best_grip, best_carry, exit_layer = state_vals
            best_arm = jnp.where(take[:, None], arm, best_arm)
            best_grip = jnp.where(take[:, None], grip, best_grip)
            best_carry = mask_carry(take, cand, best_carry)
            exit_layer = jnp.where(take, i, exit_layer)
            return best_arm, best_grip, best_carry, exit_layer

        if use_strided:
            # one SEGMENT (stride layers + head check) per loop iteration
            def body(state):
                (j, x, done, ref, best_arm, best_grip, best_carry,
                 exit_layer) = state
                base = j * stride
                x_prev = x
                for off in range(stride):  # static unroll
                    x_prev, x = run_layer(base + off, x)
                i_exit = base + stride - 1
                arm, grip, cand, take, new_ref = do_check(
                    i_exit, j == 0, x, x_prev, done, ref)
                best = commit((best_arm, best_grip, best_carry, exit_layer),
                              arm, grip, cand, take, i_exit)
                return (j + 1, x, done | take, new_ref) + best

            def cond_fn(state):
                j, _, done, *_ = state
                return (~jnp.all(done)) & (j < n_segments)
        else:
            # non-uniform exits: one layer per iteration, cond'd head check
            def body(state):
                (i, x, done, ref, best_arm, best_grip, best_carry,
                 exit_layer) = state
                x_prev, x = run_layer(i, x)

                def check(_):
                    return do_check(i, i == exits[0], x, x_prev, done, ref)

                def skip(_):
                    return (jnp.zeros((b, adim), jnp.float32),
                            jnp.zeros((b, gdim), jnp.float32), carry,
                            jnp.zeros((b,), bool), ref)

                arm, grip, cand, take, new_ref = jax.lax.cond(
                    is_exit_arr[i], check, skip, None)
                best = commit((best_arm, best_grip, best_carry, exit_layer),
                              arm, grip, cand, take, i)
                return (i + 1, x, done | take, new_ref) + best

            def cond_fn(state):
                i, _, done, *_ = state
                return (~jnp.all(done)) & (i <= last_exit)

        # ref starts as zeros: it is only consumed after the first exit's
        # check replaces it (within-timestep chain)
        init = (jnp.int32(0), x, jnp.zeros((b,), bool),
                jnp.zeros((b, adim), jnp.float32),
                jnp.zeros((b, adim), jnp.float32),
                jnp.zeros((b, gdim), jnp.float32),
                carry, jnp.full((b,), -1, jnp.int32))
        (_, _, done, _, best_arm, best_grip, best_carry,
         exit_layer) = jax.lax.while_loop(cond_fn, body, init)
        return best_arm, best_grip, best_carry, exit_layer

    def encode_frame(params, stacked, img, grip):
        """Per-frame ViT tokens for the rolling frame cache
        (eval/caching.FrameCachePolicy): one NEW frame in, cacheable
        position-independent tokens out (frame embeddings are applied at
        fuse time).  Shares encode_vision's camera routing (incl. the
        native-res gripper split, models/flamingo.dual_camera_tokens)."""
        from deer_vla_tpu.models.flamingo import dual_camera_tokens
        return dual_camera_tokens(params, img, grip, cfg, stacked)

    def decode_tokens(params, stacked, tok_rgb, tok_grip, ids, mask, carry,
                      thresholds_full, state=None):
        """Fuse cached per-frame tokens (perceiver + window fold + state)
        and run the dynamic-exit decode — the cheap tail re-run every step
        under the frame cache."""
        media = fuse_vision_tokens(params, tok_rgb, tok_grip, cfg, state,
                                   stacked, window_size=enc_w)
        x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
        mloc = ids == cfg.media_token_id
        return decode(params, stacked, media, x, mloc, mask, carry,
                      thresholds_full, state)

    return (jax.jit(step), exits, jax.jit(encode), jax.jit(decode),
            jax.jit(encode_frame), jax.jit(decode_tokens))


class ScanDeerPolicy:
    """Single-stream policy over the while-loop engine.  Same surface as
    FusedDeerPolicy."""

    def __init__(self, params: dict, cfg: DeerConfig,
                 exit_ids: Optional[List[int]] = None,
                 thresholds: Optional[List[float]] = None,
                 threshold_type: str = "L2", max_layer: Optional[int] = None,
                 steps_per_stage: int = 1, drop_unstacked: bool = False,
                 indexed_mm: bool = False, pack: bool = True,
                 quantize: Optional[str] = None):
        check_serving_supported(cfg, allow_window_folded=True,
                                allow_any_head=True)
        self.params = params
        self.cfg = cfg
        self.stacked = stack_decoder_layers(params, cfg,
                                            include_encoders=pack)
        self.quantize = quantize
        if quantize and quantize != "none":
            # weight-only int8 serving (ops/quant.py): halves the decoder /
            # encoder weight HBM traffic of the bandwidth-bound B=1 step;
            # embeddings and the action head stay full precision.  The
            # exit-threshold calibration runs on the fp model — the delta
            # distribution shift is small (per-channel symmetric) and BO
            # absorbs the rest, same as the warm-carry skew (--calib_warm).
            from deer_vla_tpu.ops.quant import quantize_serving_stacked
            self.stacked = quantize_serving_stacked(self.stacked, quantize)
        if pack:
            # serving default: encoder layers ride the stacked tree and the
            # params argument shrinks to the ~60 leaves the step reads —
            # per-dispatch marshaling is ~1 us/leaf on this runtime
            # (scripts/bench_dispatch_args.py).  The pruned tree holds NO
            # references to the per-layer originals, so a caller that drops
            # its own `params` reference (bench.py 9B mode) frees the
            # fp32/bf16 originals — pack subsumes drop_unstacked.
            self.params = prune_serving_params(params, cfg)
        elif drop_unstacked:
            # serving mode: the while-loop consumes only the stacked bf16
            # copy — free the per-layer fp32 originals (halves decoder HBM;
            # required to fit the truncated 9B on one 16GB chip).  The dict
            # is copied shallowly so the caller's tree is untouched.
            dec = dict(params["decoder"])
            dec["blocks"] = []
            dec["xattn"] = []
            self.params = dict(params)
            self.params["decoder"] = dec
        exit_ids = list(exit_ids or cfg.all_exit_ids())
        (self._step, self.exits, self._encode, self._decode,
         self._encode_frame,
         self._decode_tokens) = build_scan_step(cfg, exit_ids, threshold_type,
                                                max_layer,
                                                indexed_mm=indexed_mm)
        self.steps_per_stage = steps_per_stage
        self.cur_step = 0
        self.set_thresholds(thresholds if thresholds is not None
                            else [1e8] * len(self.exits))
        self.last_exit_layer = -1
        self.reset()

    def threshold_row(self, thresholds) -> np.ndarray:
        """Lay one per-exit threshold list/dict out as the (n_layers,)
        runtime row the while-loop compares against: -1e30 at non-exit
        layers (never passes), the given value at each exit, and +1e30 at
        the last exit (always fires).  The single source of the row-layout
        invariant — serving cores building per-lane rows must use this."""
        if isinstance(thresholds, dict):
            thresholds = [thresholds[e] for e in self.exits]
        assert len(thresholds) == len(self.exits), (thresholds, self.exits)
        full = np.full(self.cfg.n_layers, -1e30, np.float32)
        for e, t in zip(self.exits, thresholds):
            full[e] = t
        full[self.exits[-1]] = 1e30  # last exit always fires
        return full

    def set_thresholds(self, thresholds) -> None:
        self.thresholds = jnp.asarray(self.threshold_row(thresholds))

    def set_thresholds_batch(self, rows) -> None:
        """Per-stream threshold rows for batched multi-candidate serving
        (parallel BO, eval/batched_rollout.py candidates=): one per-exit
        threshold list/dict per stream -> a (B, n_layers) runtime array
        (the while-loop compares thresholds[..., i], so the same compiled
        program serves shared and per-stream layouts)."""
        self.thresholds = jnp.asarray(
            np.stack([self.threshold_row(th) for th in rows]))

    def set_threshold_array(self, arr) -> None:
        """Raw (n_layers,) or (B, n_layers) runtime threshold array, laid
        out exactly as set_thresholds builds it — the batched harness uses
        this for per-stream stage reuse (force-exit rows rebuilt per
        dispatch on host)."""
        self.thresholds = jnp.asarray(np.asarray(arr, np.float32))

    def reset(self):
        self.carry = None
        self.cur_step = 0
        self.last_exit_layer = -1

    def set_timestep(self, t: int):
        self.cur_step = t

    def _stage_thresholds(self):
        """steps_per_stage reuse (value_net.py:284-286): mid-stage, force the
        exit at the previous step's layer by swapping the RUNTIME threshold
        array (never -> layers below it, always -> that layer). Zero
        recompiles — thresholds are a program argument."""
        if (self.steps_per_stage <= 1
                or self.cur_step % self.steps_per_stage == 0
                or self.last_exit_layer < 0):
            return self.thresholds
        full = np.full(self.cfg.n_layers, -1e30, np.float32)
        full[self.last_exit_layer] = 1e30
        return jnp.asarray(full)

    def step(self, image, gripper, input_ids, attention_mask,
             state=None) -> np.ndarray:
        """One env step.  Returns a 7-dof action, or a (k, 7) plan for
        multi_step_action k>1 (same contract as DeerPolicy.step — the
        rollout loop queues the plan, eval_utils.py:668-675).

        The LSTM carry batch follows the TEXT batch (one row per stream) —
        under vit_concat serving the image batch carries window frames.

        state (--use_state models): per-frame proprio rows; threaded through
        the single program (round 1 forced these models onto the bucketed
        host-sequenced engine)."""
        if state is not None and state.shape[0] != image.shape[0]:
            raise ValueError(
                f"state rows ({state.shape[0]}) must match the image batch "
                f"({image.shape[0]}): window-folded models take one proprio "
                "row per frame in the rolling window (the adapter's "
                "state_queue, eval/rollout.py)")
        self._ensure_carry(input_ids.shape[0])
        arm, grip, self.carry, exit_layer = self._step(
            self.params, self.stacked, image, gripper, input_ids,
            attention_mask, self.carry, self._stage_thresholds(), state)
        self.last_exit_layer = int(exit_layer[0])
        return self._postprocess(arm, grip)

    def _ensure_carry(self, text_rows: int) -> None:
        b = text_rows
        if self.cfg.use_hist:
            b //= self.cfg.window_size  # text is per-frame in hist mode
        if self.carry is None or getattr(self, "_carry_rows", None) != b:
            # stream count changed (e.g. step() then step_batch()): carries
            # across batch layouts are meaningless — start fresh
            self.carry = any_zero_carry(self.cfg, b)
        self._carry_rows = b

    def _postprocess(self, arm, grip) -> np.ndarray:
        if self.cfg.head_type == "diffusion":
            # the chosen exit's conditioning feature; the DDPM sampler
            # wrapper (eval/diffusion_policy.DiffusionSamplerPolicy) maps
            # it to an action plan — same contract as DeerPolicy
            return np.asarray(arm[0], np.float32)
        k = self.cfg.head.multi_step_action
        a = np.asarray(arm[0])
        gp = np.asarray(grip[0]).reshape(-1)
        if k > 1:
            g = np.where(gp > 0.5, 1.0, -1.0).astype(np.float32)
            return np.concatenate([a.reshape(k, 6), g[:, None]],
                                  -1).astype(np.float32)
        g = 1.0 if float(gp[0]) > 0.5 else -1.0
        return np.concatenate([a, [g]]).astype(np.float32)

    def encode(self, image, gripper, input_ids, state=None):
        """The vision+embed prefix as its own program (for the vision
        cache): returns (media, x, media_locations) device handles."""
        return self._encode(self.params, self.stacked, image, gripper,
                            input_ids, state)

    def step_from_encoded(self, media, x, mloc, attention_mask,
                          state=None) -> np.ndarray:
        """Dynamic-exit decode from a (possibly cached) encoded prefix."""
        self._ensure_carry(x.shape[0])
        arm, grip, self.carry, exit_layer = self._decode(
            self.params, self.stacked, media, x, mloc, attention_mask,
            self.carry, self._stage_thresholds(), state)
        self.last_exit_layer = int(exit_layer[0])
        return self._postprocess(arm, grip)

    def encode_frame(self, image, gripper):
        """Per-frame ViT tokens (position-independent, cacheable): the
        rolling frame cache's encode half (eval/caching.FrameCachePolicy)."""
        return self._encode_frame(self.params, self.stacked, image, gripper)

    def step_from_tokens(self, tok_rgb, tok_grip, input_ids, attention_mask,
                         state=None) -> np.ndarray:
        """One env step from a window of cached per-frame ViT tokens:
        perceiver + window fold + dynamic-exit decode in one dispatch."""
        self._ensure_carry(input_ids.shape[0])
        arm, grip, self.carry, exit_layer = self._decode_tokens(
            self.params, self.stacked, tok_rgb, tok_grip, input_ids,
            attention_mask, self.carry, self._stage_thresholds(), state)
        self.last_exit_layer = int(exit_layer[0])
        return self._postprocess(arm, grip)

    def dispatch_batch(self, image, gripper, input_ids, attention_mask,
                       state=None):
        """Asynchronous step_batch: launches the program, commits the carry
        (device-side, no host sync) and returns opaque device handles.  JAX
        dispatch is async, so the host returns immediately and can do other
        work (e.g. step ANOTHER lane group's envs) while this group
        computes; convert with finish_batch.  Used by the pipelined batched
        rollout (eval/batched_rollout.py pipeline>1).

        Window-folded models (vit_concat / use_hist): image/gripper rows are
        B*W stream-major frame windows (the batched rollout's per-lane
        rolling queues); text rows are B (vit_concat) or B*W tiled per frame
        (use_hist) — the same program layout as single-stream step()."""
        w = (self.cfg.window_size
             if (self.cfg.use_hist or self.cfg.fusion_mode == "vit_concat")
             else 1)
        streams = input_ids.shape[0] // (w if self.cfg.use_hist else 1)
        if image.shape[0] != streams * w:
            raise ValueError(
                f"batched window-folded step: image rows ({image.shape[0]}) "
                f"must be streams*window ({streams}*{w}) stream-major frame "
                "windows (eval/batched_rollout.py feeds per-lane rolling "
                "queues)")
        self._ensure_carry(input_ids.shape[0])
        arm, grip, self.carry, exit_layer = self._step(
            self.params, self.stacked, image, gripper, input_ids,
            attention_mask, self.carry, self.thresholds, state)
        return arm, grip, exit_layer

    def finish_batch(self, handles):
        """Blocking half of dispatch_batch: device handles -> (actions
        (B, 7) or (B, k, 7) plans, exit_layers (B,))."""
        arm, grip, exit_layer = handles
        b = arm.shape[0]
        k = self.cfg.head.multi_step_action
        a = np.asarray(arm)
        g = np.where(np.asarray(grip) > 0.5, 1.0, -1.0)
        if k > 1:
            acts = np.concatenate([a.reshape(b, k, 6), g[:, :, None]],
                                  -1).astype(np.float32)
        else:
            acts = np.concatenate([a, g], -1).astype(np.float32)
        return acts, np.asarray(exit_layer).astype(np.int64)

    def step_batch(self, image, gripper, input_ids, attention_mask,
                   state=None):
        """B parallel streams, one dispatch: returns (actions (B, 7) — or
        (B, k, 7) plans for multi_step_action k>1 — and exit_layers (B,))
        with per-stream dynamic exits."""
        return self.finish_batch(self.dispatch_batch(
            image, gripper, input_ids, attention_mask, state))

    def reset_streams(self, stream_mask) -> None:
        """Per-stream episode reset for step_batch, routed by carry layout
        (models/heads.any_zero_carry): LSTM tuples (deterministic /
        diffusion features), GPTCarry with per-stream counts (gpt), no-op
        for the stateless fc head."""
        if self.carry is None or self.cfg.head_type == "fc":
            return
        m = jnp.asarray(stream_mask)
        fresh = any_zero_carry(self.cfg, int(m.shape[0]))
        if self.cfg.head_type == "gpt":
            self.carry = type(self.carry)(
                jnp.where(m[:, None, None], fresh.history,
                          self.carry.history),
                jnp.where(m, fresh.count, self.carry.count))
            return
        self.carry = tuple(jnp.where(m[None, :, None], f, c)
                           for f, c in zip(fresh, self.carry))
