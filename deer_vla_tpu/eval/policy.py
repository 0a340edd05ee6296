"""Streaming inference policy with dynamic early exit — the TPU-native
replacement for ModelWrapper + the per-layer Python break
(robot_flamingo/eval/eval_utils.py:187-490, mosaic_gpt_3b.py:438-443).

Design (BASELINE.json north star): dynamic layer counts map to a small set of
pre-compiled *exit buckets*.  The decoder layers between two consecutive exits
are one jitted program that also runs the speculative extra-exit head and the
action-delta compare on device.  Only ONE scalar (the delta) crosses to the
host per bucket; if the threshold test passes, no further buckets are
launched — so the 5-6x FLOPs saving of early exit is real (work is never
issued), unlike a masked lax.scan over all layers.

Per-timestep protocol (faithful to value_net.py:120-133 + flamingo_mpt.py:443-461):
  1. encode prefix: ViT x2 + perceiver + token embed          [1 program]
  2. for each exit bucket k: run layers (prev_exit, exit_k],
     speculative head_step (carry NOT committed); the delta is WITHIN-
     timestep: bucket 0 vs the pseudo action from the layer below it
     (value_net.py:121-126 — layer-indexed, so every timestep), bucket
     k>0 vs bucket k-1's action                               [1 program each]
  3. on exit: commit that bucket's candidate carry, return its action.
     Exactly one carry commit per env step.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.flamingo import encode_vision
from deer_vla_tpu.models.heads import (any_head_step, any_zero_carry,
                                       head_action_width)
from deer_vla_tpu.models.mpt import decoder_segment_forward, embed_tokens
from deer_vla_tpu.models.value_net import ExitController, get_delta


class DeerPolicy:
    """Holds compiled programs + the functional state for one rollout stream.

    Args:
      params: model params (device).
      cfg: DeerConfig (n_layers defines the compiled depth).
      controller: ExitController for dynamic exit, or None.
      exit_id: fixed exit layer (static inference) when controller is None;
               -1/None means the final layer.
    """

    def __init__(self, params: dict, cfg: DeerConfig,
                 controller: Optional[ExitController] = None,
                 exit_id: Optional[int] = None,
                 threshold_type: str = "L2",
                 use_action_ensemble: bool = False,
                 multi_execution: int = 1,
                 quantize: Optional[str] = None):
        from deer_vla_tpu.eval.scan_policy import check_serving_supported
        check_serving_supported(cfg, allow_window_folded=True,
                                allow_any_head=True)
        if cfg.head_type == "diffusion" and use_action_ensemble:
            raise NotImplementedError(
                "action ensembling averages exit ACTIONS; the diffusion "
                "head's exits emit conditioning features")
        self.quantize = quantize
        if quantize and quantize != "none":
            # weight-only int8 (ops/quant.py), same scheme as the while-loop
            # engine: decoder blocks + gated x-attn go int8 (the segment
            # programs' weight HBM traffic); heads, embeddings (wte,
            # patch_embed) and the unstacked encoder leaves stay full
            # precision.  Consumed transparently by ops.layers.linear's
            # q/s layout through mpt_block_forward / gated x-attn.
            from deer_vla_tpu.ops.quant import QUANT_MODES, quantize_tree
            if quantize not in QUANT_MODES:
                raise ValueError(f"unknown quantize mode {quantize!r} "
                                 f"(want one of {QUANT_MODES})")
            sk = {"int8_w8a8": "s8", "int4": "s4",
                  "int4_w8a8": "s48"}.get(quantize, "s")
            dec = params["decoder"]
            params = dict(params, decoder=dict(
                dec, blocks=quantize_tree(dec["blocks"], scale_key=sk),
                xattn=quantize_tree(dec["xattn"], scale_key=sk)))
        self.params = params
        self.cfg = cfg
        self.controller = controller
        self.threshold_type = threshold_type
        self.use_action_ensemble = use_action_ensemble
        self.multi_execution = multi_execution
        if exit_id is None:
            exit_id = cfg.n_layers - 1
        if exit_id < 0:
            exit_id += cfg.n_layers
        self.exit_id = exit_id

        if controller is not None:
            ids = [i for i in controller.exit_id_list
                   if i <= controller.effective_max]
            self.bucket_exits: List[int] = ids
        else:
            self.bucket_exits = [exit_id]

        self._build_programs()
        self.reset()

    # -- compiled programs --------------------------------------------------

    def _build_programs(self):
        cfg = self.cfg
        params = self.params

        # packed argument trees: per-dispatch host marshaling on this
        # runtime costs ~1 us per pytree leaf (scripts/bench_dispatch_args
        # .py), and this engine dispatches encode + up to n_exits segment
        # programs per action WITH a blocking delta readback between
        # segments — so the marshal sits on the action's critical path here.
        # Each program receives ONLY the leaves it reads (shared helpers
        # with the while-loop engine, eval/scan_policy.py).
        from deer_vla_tpu.eval.scan_policy import (prune_encoder_params,
                                                   stack_encoder_layers)
        self.enc_params = prune_encoder_params(params)
        self.enc_stacked = stack_encoder_layers(params, cfg.dtypes.cdt)
        if self.quantize and self.quantize != "none":
            from deer_vla_tpu.ops.quant import quantize_serving_stacked
            self.enc_stacked = quantize_serving_stacked(self.enc_stacked,
                                                        self.quantize)

        # window-folded serving (vit_concat / use_hist): the adapter feeds a
        # rolling W-frame window per step; encode_vision folds it into the
        # media tokens (same protocol as the while-loop engine,
        # eval_utils.py:344-386)
        enc_w = (cfg.window_size
                 if (cfg.fusion_mode == "vit_concat" or cfg.use_hist) else 1)
        self._enc_w = enc_w

        @jax.jit
        def encode_prefix(params, stacked, img, grip, ids, mask, state):
            # state (or None) reaches the state_fc vision token when the
            # model was trained with --use_state (flamingo.py:120-126);
            # None vs array retraces, which is fine — it's fixed per rollout
            media = encode_vision(params, img, grip, cfg, state,
                                  stacked=stacked, window_size=enc_w)
            x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
            media_locations = ids == cfg.media_token_id
            return media, x, media_locations

        self._encode_prefix = encode_prefix

        def seg_params(start, stop):
            """Leaves segment [start, stop) reads: its layer slice (None
            padding below `start` keeps _layer's absolute indices, zero
            leaves) and the criterion head (ALWAYS the shared extra exit —
            the exit decision runs value_net on extra_exit regardless of
            layerwise_exit_eval, eval_calvin.py:583)."""
            dec = params["decoder"]
            sp = {"decoder": {
                "blocks": [None] * start + list(dec["blocks"][start:stop]),
                "xattn": [None] * start + list(dec["xattn"][start:stop])}}
            if cfg.share_exit:
                sp["lm_head"] = params["lm_head"]
            else:
                sp["extra_exit"] = params["extra_exit"]
            return sp

        def segment(start, stop, first_exit, params, x, mask, media,
                    media_locations, carry, prev_action, state):
            """Layers [start, stop) + speculative head + delta."""
            x_prev, x_out = decoder_segment_forward(
                params["decoder"], x, mask, media, cfg, start, stop,
                media_locations)
            head = params["lm_head"] if cfg.share_exit else params["extra_exit"]

            def eval_head(x_in, c):
                # any_head_step routes by cfg.head_type; for 'diffusion' the
                # HeadOutput.actions slot carries the conditioning FEATURE
                # and the delta criterion compares features (models/heads.py).
                # use_hist: the head consumes the FULL frame window (the
                # window IS the memory — no streamed carry,
                # flamingo_mpt.py:700-740) and emits the last step's action.
                if cfg.use_hist:
                    from deer_vla_tpu.models.heads import any_head_forward
                    # state: full per-frame proprio rows, like training
                    # (embed_state added per frame) and the while-loop
                    # engine (scan_policy.py hstate)
                    o = any_head_forward(head, x_in.astype(jnp.float32), cfg,
                                         state, window=self._enc_w,
                                         last_action=True)
                    return o, c
                return any_head_step(head, x_in.astype(jnp.float32), c,
                                     cfg, state)

            out, cand_carry = eval_head(x_out, carry)
            action = out.actions[:, 0]  # (B, 6k) — or (B, hidden) feature
            if first_exit:
                # pseudo previous action from the layer below the first exit
                # (value_net.py:122-126), same uncommitted carry
                pseudo, _ = eval_head(x_prev, carry)
                ref_action = pseudo.actions[:, 0]
            else:
                ref_action = prev_action
            delta = get_delta(action, ref_action, self.threshold_type)
            return x_out, out, cand_carry, delta.mean()

        self._segments = []
        self._seg_params = []
        prev = 0
        for k, e in enumerate(self.bucket_exits):
            fn_normal = jax.jit(functools.partial(segment, prev, e + 1, False))
            fn_first = (jax.jit(functools.partial(segment, prev, e + 1, True))
                        if k == 0 else None)
            self._segments.append((prev, e, fn_normal, fn_first))
            self._seg_params.append(seg_params(prev, e + 1))
            prev = e + 1

        # layerwise_exit_eval: the chosen exit's OWN head produces the final
        # action (lm_exits[e] / lm_head for the last layer,
        # flamingo_mpt.py:450-457), each head streaming its own LSTM carry;
        # the criterion above stays on extra_exit (eval_calvin.py:583).
        self._layerwise = cfg.layerwise_exit_eval and not cfg.share_exit
        self._final_fns = {}
        self._final_params = {}
        if self._layerwise:
            def final_head(e, hp, x_out, c, state):
                head = (hp["lm_head"] if e == cfg.n_layers - 1
                        else hp["lm_exits"][str(e)])
                if cfg.use_hist:
                    from deer_vla_tpu.models.heads import any_head_forward
                    o = any_head_forward(head, x_out.astype(jnp.float32),
                                         cfg, state, window=self._enc_w,
                                         last_action=True)
                    return o, c
                return any_head_step(head, x_out.astype(jnp.float32), c,
                                     cfg, state)

            for e in self.bucket_exits:
                if e == cfg.n_layers - 1:
                    hp = {"lm_head": params["lm_head"]}
                elif str(e) in params.get("lm_exits", {}):
                    hp = {"lm_exits": {str(e): params["lm_exits"][str(e)]}}
                else:
                    raise ValueError(
                        f"layerwise_exit_eval: no lm_exits[{e}] head in the "
                        "checkpoint (model not trained multi_exit?)")
                self._final_fns[e] = jax.jit(functools.partial(final_head, e))
                self._final_params[e] = hp

    # -- state --------------------------------------------------------------

    def reset(self):
        """New subtask: clear LSTM carries + controller state
        (ModelWrapper.reset, eval_utils.py:252-277)."""
        self.carry = None
        self.layer_carries = {}  # layerwise: per-exit-head streamed carries
        self.last_exit_layer = -1
        if self.controller is not None:
            self.controller.reset_episode()

    def set_timestep(self, t: int):
        if self.controller is not None:
            self.controller.set_timestep(t)

    # -- stepping -----------------------------------------------------------

    def step(self, image: jnp.ndarray, gripper: jnp.ndarray,
             input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
             state: Optional[jnp.ndarray] = None) -> np.ndarray:
        """One env step.  image/gripper: (1, 1, 1, 3, H, W) preprocessed;
        returns the 7-dof action (numpy) with the gripper binarized to ±1
        (eval_utils.py:458-475)."""
        media, x, mloc = self._encode_prefix(self.enc_params,
                                             self.enc_stacked, image,
                                             gripper, input_ids,
                                             attention_mask, state)
        return self.step_from_encoded(media, x, mloc, attention_mask, state)

    def step_from_encoded(self, media, x, mloc, attention_mask,
                          state: Optional[jnp.ndarray] = None) -> np.ndarray:
        """The bucket-sequencing tail of step, from a (possibly cached)
        encoded prefix — the single implementation the vision-cache wrapper
        reuses (eval/caching.VisionCacheDeerPolicy)."""
        # stream count = text rows, except use_hist where text is per-frame
        streams = x.shape[0] // (self._enc_w if self.cfg.use_hist else 1)
        if self.carry is None:
            self.carry = any_zero_carry(self.cfg, streams)

        ctrl = self.controller
        # window-folded state models: the head consumes the LAST frame's
        # proprio row (training slices the same way, flamingo.py vit_concat
        # branch); use_hist heads take the full per-frame rows
        hstate = state
        if (state is not None and self._enc_w > 1
                and self.cfg.fusion_mode == "vit_concat"):
            hstate = state.reshape((streams, self._enc_w) + state.shape[1:])[:, -1]
        # action width is 6k for multi_step_action k (flat head output);
        # the feature dim for the diffusion head
        adim = head_action_width(self.cfg)
        prev_action = jnp.zeros((streams, adim), jnp.float32)

        reuse = ctrl is not None and ctrl.reuse_stage_exit()
        chosen = None
        for k, (start, e, fn, fn_first) in enumerate(self._segments):
            # the exit criterion is within-timestep (value_net.py:120-133):
            # bucket 0 ALWAYS compares against the pseudo action from the
            # layer below (the `i - interval < 0` branch is layer-indexed);
            # bucket k>0 compares against bucket k-1's action.  The fixed
            # exit path (ctrl None) skips the pseudo forward entirely.
            run_fn = fn_first if (k == 0 and ctrl is not None) else fn
            x, out, cand_carry, delta = run_fn(
                self._seg_params[k], x, attention_mask, media, mloc,
                self.carry, prev_action, hstate)
            prev_action = out.actions[:, 0]
            if ctrl is None:
                chosen = (e, out, cand_carry)
                break
            if reuse:
                if e >= min(ctrl.cur_exit_id, ctrl.effective_max):
                    chosen = (e, out, cand_carry)
                    break
                continue
            ctrl.record_action((np.asarray(out.actions[:, 0]),
                                np.asarray(out.gripper_probs[:, 0])))
            if ctrl.should_exit(e, float(delta)):  # ONE scalar host read
                chosen = (e, out, cand_carry)
                break
        assert chosen is not None, "last bucket must exit (threshold=inf)"
        exit_layer, out, cand_carry = chosen
        self.carry = cand_carry  # the single commit per env step
        self.last_exit_layer = exit_layer
        crit_out = out  # criterion (extra-exit) output, for record_action
        if self._layerwise:
            # x holds the chosen bucket's layer output (the loop breaks at
            # the committed bucket); run that exit's OWN head with its own
            # streamed carry — the extra-exit carry above tracks the
            # criterion head exactly as in non-layerwise serving.
            lc = self.layer_carries.get(exit_layer)
            if lc is None:
                lc = any_zero_carry(self.cfg, streams)
            out, new_lc = self._final_fns[exit_layer](
                self._final_params[exit_layer], x, lc, hstate)
            self.layer_carries[exit_layer] = new_lc
        if self.cfg.head_type == "diffusion":
            # the chosen exit's conditioning feature; the DDPM sampler
            # wrapper (eval/diffusion_policy.DiffusionSamplerPolicy) maps it
            # to an action plan (eval_utils.py:388-419 use_diff branch)
            return np.asarray(out.actions[0, 0], np.float32)
        if ctrl is not None and reuse:
            ctrl.cur_exit_id = exit_layer
            ctrl.record_action((np.asarray(crit_out.actions[:, 0]),
                                np.asarray(crit_out.gripper_probs[:, 0])))

        if self.use_action_ensemble and ctrl is not None:
            # mean of the last two evaluated exits, arm AND gripper, then
            # reset the list so it never spans env steps
            # (eval_utils.py:457-463 + value_net.reset_actions)
            arm_e, grip_e = ctrl.get_ensemble_action()
            ctrl.action_list.clear()
            arm = np.asarray(arm_e[0], np.float32)          # (6k,)
            gp = np.asarray(grip_e, np.float32).reshape(-1)  # (k,)
        else:
            arm = np.asarray(out.actions[0, 0], np.float32)
            gp = np.asarray(out.gripper_probs[0, 0], np.float32).reshape(-1)
        k = self.cfg.head.multi_step_action
        if k > 1:
            # multi_step_action: the head predicts a k-step plan; emit (k, 7)
            # for the rollout planned-actions queue (eval_utils.py:668-675)
            grip = np.where(gp > 0.5, 1.0, -1.0).astype(np.float32)
            plan = np.concatenate([arm.reshape(k, 6), grip[:, None]],
                                  -1).astype(np.float32)
            if self.multi_execution > 1:  # repeat each planned action m times
                plan = np.repeat(plan, self.multi_execution, axis=0)
            return plan
        grip = 1.0 if float(gp[0]) > 0.5 else -1.0
        action = np.concatenate([arm, [grip]]).astype(np.float32)
        if self.multi_execution > 1:
            # repeat one predicted action k times (ModelWrapper
            # multi_execution, eval_utils.py:469-471); the rollout loop
            # consumes the plan one env step at a time
            return np.tile(action, (self.multi_execution, 1))
        return action
