"""Batched streaming inference: many env streams per device step.

The reference parallelizes rollout only across GPUs (one env per rank,
eval_utils.py:521-527).  On TPU, a single chip is heavily underutilized by
batch-1 streaming — batching B independent CALVIN streams into one program
multiplies actions/sec/chip by nearly B for the static-exit path.

Dynamic exit with a batch is inherently a trade-off (streams want different
depths).  Strategy here ('consensus-free masked commit'):
  * run bucket k for the WHOLE batch,
  * each stream compares its delta to its threshold on device,
  * a stream that exits freezes its committed action/carry via masked
    select; remaining buckets still run for the whole batch but finished
    streams' carries/outputs are no longer updated,
  * stop launching buckets once every stream has exited (one bool per
    bucket crosses to host).
FLOPs saving is then governed by the SLOWEST stream in the batch per step —
for throughput-oriented serving this is the right trade; for per-stream
FLOPs parity use DeerPolicy (batch 1).
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
from deer_vla_tpu.models.mpt import decoder_segment_forward, embed_tokens
from deer_vla_tpu.models.value_net import get_delta
from deer_vla_tpu.ops.lstm import zero_carry


class BatchedDeerPolicy:
    """B parallel streams, shared params, per-stream carries and exit state."""

    def __init__(self, params: dict, cfg: DeerConfig, batch: int,
                 exit_ids: Optional[List[int]] = None,
                 thresholds: Optional[List[float]] = None,
                 threshold_type: str = "L2", steps_per_stage: int = 1):
        from deer_vla_tpu.eval.scan_policy import check_serving_supported
        check_serving_supported(cfg)
        self.params = params
        self.cfg = cfg
        self.batch = batch
        self.exit_ids = list(exit_ids or cfg.all_exit_ids())
        if thresholds is None:
            thresholds = [0.0] * (len(self.exit_ids) - 1) + [1e8]
        self.thresholds = list(thresholds)
        self.threshold_type = threshold_type
        # stage reuse (value_net.py set_timestep/steps_per_stage): a stream
        # keeps its chosen exit for steps_per_stage timesteps; thresholds
        # are runtime (B,) arrays so reuse needs no recompilation
        self.steps_per_stage = steps_per_stage
        self._build()
        self.reset()

    def set_thresholds(self, thresholds: List[float]):
        """Runtime swap (BO sweeps) — thresholds are program inputs."""
        self.thresholds = list(thresholds)

    def _build(self):
        cfg = self.cfg

        @jax.jit
        def encode_prefix(params, img, grip, ids, mask):
            media = encode_vision(params, img, grip, cfg)
            x = embed_tokens(params["decoder"], ids, cfg.dtypes.cdt)
            return media, x, ids == cfg.media_token_id

        self._encode_prefix = encode_prefix

        def segment(start, stop, first_exit, params, x, mask, media,
                    mloc, carry, prev_action, done, best_out, best_carry,
                    exit_layers, thr):
            x_prev, x_out = decoder_segment_forward(
                params["decoder"], x, mask, media, cfg, start, stop, mloc)
            head = params["lm_head"] if cfg.share_exit else params["extra_exit"]
            out, cand_carry = head_step(head, x_out.astype(jnp.float32),
                                        carry, cfg.head, None)
            action = out.actions[:, 0]
            if first_exit:
                # first exit: pseudo action from the layer below, EVERY
                # timestep (value_net.py:121-126 is layer-indexed)
                pseudo, _ = head_step(head, x_prev.astype(jnp.float32),
                                      carry, cfg.head, None)
                ref = pseudo.actions[:, 0]
            else:
                ref = prev_action
            delta = get_delta(action, ref, self.threshold_type)  # (B, 1)->(B,)
            delta = delta.reshape(-1)
            exits_now = (~done) & ((delta <= thr) | (stop >= cfg.n_layers))
            em = exits_now[:, None]
            new_best_out = tuple(
                jnp.where(em[:, None] if b.ndim == 3 else em, n, b)
                for n, b in zip((out.actions, out.gripper_probs), best_out))
            new_best_carry = tuple(
                jnp.where(exits_now[None, :, None], n, b)
                for n, b in zip(cand_carry, best_carry))
            new_done = done | exits_now
            # exit layers accumulate ON DEVICE — the only per-bucket host
            # read is the all_done bool that enables early stopping
            exit_layers = jnp.where(exits_now, stop - 1, exit_layers)
            return (x_out, new_done, new_best_out, new_best_carry,
                    jnp.all(new_done), exit_layers, action)

        self._segments = []
        prev = 0
        for k, e in enumerate(self.exit_ids):
            fn = jax.jit(functools.partial(segment, prev, e + 1, k == 0))
            self._segments.append((e, fn))
            prev = e + 1

    def reset(self, stream_mask: Optional[np.ndarray] = None):
        """Reset all streams (or the masked subset) to episode start."""
        b = self.batch
        fresh = zero_carry(self.cfg.head.lstm_num_layers, b,
                           self.cfg.head.hidden_size, jnp.float32)
        if stream_mask is None or not hasattr(self, "carry"):
            self.carry = fresh
            self._t = np.zeros(b, np.int64)
            self._stage_exit = np.full(b, -1, np.int64)
        else:
            m = jnp.asarray(stream_mask)
            self.carry = tuple(jnp.where(m[None, :, None], f, c)
                               for f, c in zip(fresh, self.carry))
            self._t = np.where(stream_mask, 0, self._t)
            self._stage_exit = np.where(stream_mask, -1, self._stage_exit)

    def step(self, image: jnp.ndarray, gripper: jnp.ndarray,
             input_ids: jnp.ndarray, attention_mask: jnp.ndarray
             ) -> Tuple[np.ndarray, np.ndarray]:
        """All streams advance one env step.

        image/gripper: (B, 1, 1, 3, H, W). Returns (actions (B, 7) with
        binarized gripper, exit_layers (B,))."""
        media, x, mloc = self._encode_prefix(self.params, image, gripper,
                                             input_ids, attention_mask)
        b = self.batch
        adim = self.cfg.head.out_features * self.cfg.head.multi_step_action
        gdim = self.cfg.head.multi_step_action
        done = jnp.zeros((b,), bool)
        best_out = (jnp.zeros((b, 1, adim), jnp.float32),
                    jnp.zeros((b, 1, gdim), jnp.float32))
        best_carry = self.carry
        exit_layers = jnp.full((b,), -1, jnp.int32)
        # within-timestep reference chain (value_net.py:120-133)
        prev_action = jnp.zeros((b, adim), jnp.float32)
        # per-stream stage reuse: during a held stage the delta test is
        # bypassed — threshold +inf at the recorded exit's bucket, -inf
        # before it (value_net.py reuse semantics, per stream)
        k_stage = self.steps_per_stage
        reuse = ((self._t % k_stage != 0) & (self._stage_exit >= 0)
                 if k_stage > 1 else np.zeros(b, bool))
        for j, (e, fn) in enumerate(self._segments):
            base = 1e30 if j == len(self._segments) - 1 else \
                float(self.thresholds[j])
            thr_np = np.where(reuse,
                              np.where(e >= self._stage_exit, 1e30, -1e30),
                              base).astype(np.float32)
            (x, done, best_out, best_carry, all_done, exit_layers,
             action) = fn(self.params, x, attention_mask, media, mloc,
                          self.carry, prev_action, done, best_out,
                          best_carry, exit_layers, jnp.asarray(thr_np))
            # within-timestep: next bucket compares vs this bucket's action
            # (value_net.py:127 action_list semantics)
            prev_action = action
            if bool(all_done):  # ONE bool host read per bucket
                break
        self.carry = best_carry
        if k_stage > 1:
            el_host = np.asarray(exit_layers, np.int64)
            self._stage_exit = np.where(reuse, self._stage_exit, el_host)
        self._t += 1
        k = self.cfg.head.multi_step_action
        arm = np.asarray(best_out[0][:, 0])
        gp = np.asarray(best_out[1][:, 0])  # (B, k)
        grip = np.where(gp > 0.5, 1.0, -1.0)
        if k > 1:
            # (B, k, 7) plans for multi_step_action checkpoints
            acts = np.concatenate([arm.reshape(b, k, 6), grip[:, :, None]],
                                  -1).astype(np.float32)
        else:
            acts = np.concatenate([arm, grip], -1).astype(np.float32)
        return acts, np.asarray(exit_layers).astype(np.int64)
