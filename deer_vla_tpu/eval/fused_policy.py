"""lax.cond-chain dynamic-exit engine — EQUIVALENCE ORACLE, not a serving
path.

STATUS (deliberate): the production single-program engine is
eval/scan_policy.ScanDeerPolicy (lax.while_loop; what `--engine fused`,
bench.py and all serving surfaces run).  This unrolled cond-chain variant
computes the identical math through an independent program structure but
compiles 30x slower at 3B over a tunneled backend (45+ min vs ~90 s —
CLAUDE.md), so it is kept ONLY as the cross-engine equivalence oracle on
CPU-sized configs (tests/test_scan_policy.py, tests/test_fusion_modes.py);
new engine features (quantize modes, proprio, plans) land on the while-loop
engine first and are NOT required here.  Do not wire it into CLIs or
serving.

Original design notes: the whole per-timestep decision chain compiles into
ONE XLA program — each exit bucket (decoder layers (prev_exit, exit_k] +
speculative head + delta compare) sits inside a lax.cond whose predicate is
"not exited yet", so XLA executes only the taken branch, early exit skips
the remaining layers' FLOPs, and the host dispatches one program per action
(the BASELINE.json north-star property, shared by the while-loop engine).
Thresholds are a runtime ARRAY argument, so BO sweeps reuse one compiled
program across candidates.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.action_head import head_step
from deer_vla_tpu.models.flamingo import encode_vision
from deer_vla_tpu.models.mpt import decoder_segment_forward, embed_tokens, \
    make_attn_bias
from deer_vla_tpu.models.value_net import get_delta
from deer_vla_tpu.ops.lstm import zero_carry


def build_fused_step(cfg: DeerConfig, exit_ids: List[int],
                     threshold_type: str = "L2", max_layer: Optional[int] = None):
    """Returns jitted step(params, img, grip, ids, mask, carry, thresholds)
    -> (arm, gripper_prob, new_carry, exit_layer)."""
    ml = (max_layer if max_layer is not None else cfg.n_layers) - 1
    exits = [e for e in exit_ids if e <= ml] or [exit_ids[0]]
    segments = []
    prev = 0
    for e in exits:
        segments.append((prev, e + 1))
        prev = e + 1

    def step(params, img, grip, ids, mask, carry, thresholds):
        media = encode_vision(params, img, grip, cfg)
        x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
        mloc = ids == cfg.media_token_id
        head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
        b = x.shape[0]
        # multi_step_action k>1: arm width 6k, gripper width k (flat head
        # output); the exit delta spans the full plan, as in DeerPolicy
        adim = cfg.head.out_features * cfg.head.multi_step_action
        gdim = cfg.head.multi_step_action

        done = jnp.zeros((), bool)
        best_arm = jnp.zeros((b, adim), jnp.float32)
        best_grip = jnp.zeros((b, gdim), jnp.float32)
        best_carry = carry
        exit_layer = jnp.zeros((), jnp.int32)
        # within-timestep reference chain (value_net.py:120-133): set by the
        # first bucket's pseudo action, then each bucket's own action
        ref_action = jnp.zeros((b, adim), jnp.float32)

        for k, (start, stop) in enumerate(segments):
            is_last = k == len(segments) - 1

            def run(ops, start=start, stop=stop, k=k):
                x, ref_action = ops
                x_prev, x_out = decoder_segment_forward(
                    params["decoder"], x, mask, media, cfg, start, stop, mloc)
                # head + carry in fp32: the LSTM carry persists across the
                # whole episode, bf16 accumulation would drift
                out, cand = head_step(head, x_out.astype(jnp.float32), carry,
                                      cfg.head, None)
                action = out.actions[:, 0].astype(jnp.float32)
                if k == 0:
                    # first exit: pseudo action from the layer below, EVERY
                    # timestep (value_net.py:121-126 is layer-indexed)
                    pseudo, _ = head_step(head, x_prev.astype(jnp.float32),
                                          carry, cfg.head, None)
                    ref = pseudo.actions[:, 0].astype(jnp.float32)
                else:
                    ref = ref_action
                delta = get_delta(action, ref, threshold_type).mean()
                grip = out.gripper_probs[:, 0].astype(jnp.float32)
                return x_out, action, grip, cand, delta

            def skip(ops, k=k):
                x, ref_action = ops
                return (x, jnp.zeros((b, adim), jnp.float32),
                        jnp.zeros((b, gdim), jnp.float32), carry,
                        jnp.asarray(jnp.inf, jnp.float32))

            x, action, grip, cand, delta = jax.lax.cond(
                done, skip, run, (x, ref_action))
            take = (~done) & ((delta <= thresholds[k]) | is_last)
            best_arm = jnp.where(take, action, best_arm)
            best_grip = jnp.where(take, grip, best_grip)
            best_carry = tuple(jnp.where(take, c, bc)
                               for c, bc in zip(cand, best_carry))
            exit_layer = jnp.where(take, jnp.int32(stop - 1), exit_layer)
            ref_action = jnp.where(done, ref_action, action)
            done = done | take

        return best_arm, best_grip, best_carry, exit_layer

    return jax.jit(step), exits


class FusedDeerPolicy:
    """Drop-in single-stream policy using the fused program.  Same public
    surface as eval/policy.DeerPolicy (reset / set_timestep / step /
    last_exit_layer); steps_per_stage stage reuse works through the runtime
    threshold array (zero recompiles), like the while-loop engine."""

    def __init__(self, params: dict, cfg: DeerConfig,
                 exit_ids: Optional[List[int]] = None,
                 thresholds: Optional[List[float]] = None,
                 threshold_type: str = "L2", max_layer: Optional[int] = None,
                 steps_per_stage: int = 1):
        from deer_vla_tpu.eval.scan_policy import check_serving_supported
        check_serving_supported(cfg)
        self.params = params
        self.cfg = cfg
        exit_ids = list(exit_ids or cfg.all_exit_ids())
        self._step, self.exits = build_fused_step(cfg, exit_ids,
                                                  threshold_type, max_layer)
        if thresholds is None:
            thresholds = [1e8] * len(self.exits)
        self.set_thresholds(thresholds)
        self.steps_per_stage = steps_per_stage
        self.cur_step = 0
        self.last_exit_layer = -1
        self.reset()

    def set_thresholds(self, thresholds) -> None:
        if isinstance(thresholds, dict):
            thresholds = [thresholds[e] for e in self.exits]
        assert len(thresholds) == len(self.exits)
        self.thresholds = jnp.asarray(thresholds, jnp.float32)

    def reset(self):
        self.carry = None
        self.cur_step = 0
        self.last_exit_layer = -1

    def set_timestep(self, t: int):
        self.cur_step = t

    def _stage_thresholds(self):
        """steps_per_stage reuse (value_net.py:284-286): mid-stage, force
        the exit at the previous step's segment by swapping the RUNTIME
        per-segment threshold array (-inf below it, +inf at it)."""
        if (self.steps_per_stage <= 1
                or self.cur_step % self.steps_per_stage == 0
                or self.last_exit_layer < 0):
            return self.thresholds
        full = np.full(len(self.exits), -np.inf, np.float32)
        full[self.exits.index(self.last_exit_layer)] = np.inf
        return jnp.asarray(full)

    def step(self, image, gripper, input_ids, attention_mask,
             state=None) -> np.ndarray:
        if self.carry is None:
            self.carry = zero_carry(self.cfg.head.lstm_num_layers,
                                    image.shape[0], self.cfg.head.hidden_size,
                                    jnp.float32)
        arm, grip, self.carry, exit_layer = self._step(
            self.params, image, gripper, input_ids, attention_mask,
            self.carry, self._stage_thresholds())
        self.last_exit_layer = int(exit_layer)
        k = self.cfg.head.multi_step_action
        a = np.asarray(arm[0])
        gp = np.asarray(grip[0]).reshape(-1)
        if k > 1:
            # (k, 7) plan for the rollout queue, as DeerPolicy emits
            g = np.where(gp > 0.5, 1.0, -1.0).astype(np.float32)
            return np.concatenate([a.reshape(k, 6), g[:, None]],
                                  -1).astype(np.float32)
        g = 1.0 if float(gp[0]) > 0.5 else -1.0
        return np.concatenate([a, [g]]).astype(np.float32)
