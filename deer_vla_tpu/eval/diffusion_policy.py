"""DDPM sampling wrapper for head_type='diffusion' serving.

Port of the ModelWrapper use_diff branch (eval_utils.py:388-419):
per env step the backbone + chosen exit produce a conditioning FEATURE
(the LSTM output, use_diff protocol action_head.py:602-603); this wrapper
  1. normalizes the executed-action history (hist = n_obs_steps-1 actions,
     zero-padded at episode start, eval_utils.py:257-258),
  2. builds a horizon-length cond_data with the history inpainted
     (cond_mask on the first hist rows, :402-410),
  3. runs the reverse-diffusion lax.scan (ONE jitted program — the
     reference loops 150 python steps, action_head.py:1028-1060),
  4. unnormalizes, takes rows [hist:] as the action plan, binarizes the
     gripper (:411-419) and returns a (k, 7) plan for the rollout queue.

The wrapped policy must be a DeerPolicy over a diffusion-head model (its
step() returns the (hidden,) feature of the chosen exit).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.models.diffusion import (conditional_sample,
                                           conditional_sample_ddim,
                                           ddpm_buffers)
from deer_vla_tpu.models.heads import diffusion_head_config


class DiffusionSamplerPolicy:
    """Same policy surface as DeerPolicy (step/reset/set_timestep/cfg/
    last_exit_layer) so CalvinPolicyAdapter and the rollout loop compose
    unchanged."""

    def __init__(self, policy, params: dict, future_act_len: int = -1,
                 seed: int = 0, sample_steps: int = 0, ddim_eta: float = 0.0):
        assert policy.cfg.head_type == "diffusion", policy.cfg.head_type
        self.policy = policy
        self.cfg = policy.cfg
        dcfg = diffusion_head_config(self.cfg)
        self.dcfg = dcfg
        self.hist_len = self.cfg.n_obs_steps - 1
        self.future_act_len = future_act_len
        self.adim = dcfg.input_dim
        norm = params["diffusion"]["norm"]
        self._scale = np.asarray(norm["scale"], np.float32)
        self._offset = np.asarray(norm["offset"], np.float32)
        unet = params["diffusion"]["unet"]
        buf = ddpm_buffers(dcfg)

        if sample_steps and sample_steps > 0:
            # DDIM fast path: sample_steps U-Net evaluations instead of
            # dcfg.n_timesteps (--diff_steps; the reference always runs the
            # full DDPM chain, action_head.py:1028-1060)
            @jax.jit
            def sample(rng, cond_data, cond_mask, feature):
                return conditional_sample_ddim(
                    unet, buf, rng, cond_data, cond_mask, dcfg,
                    global_cond=feature, steps=sample_steps, eta=ddim_eta)
        else:
            @jax.jit
            def sample(rng, cond_data, cond_mask, feature):
                return conditional_sample(unet, buf, rng, cond_data,
                                          cond_mask, dcfg,
                                          global_cond=feature)

        self._sample = sample
        self._base_rng = jax.random.PRNGKey(seed)
        self._step_i = 0
        self.reset()

    # -- policy surface -----------------------------------------------------

    @property
    def last_exit_layer(self) -> int:
        return self.policy.last_exit_layer

    def reset(self):
        self.policy.reset()
        # zero action history at episode start (eval_utils.py:257-258)
        self._hist = deque([np.zeros(self.adim, np.float32)
                            for _ in range(self.hist_len)],
                           maxlen=max(self.hist_len, 1))

    def set_timestep(self, t: int):
        self.policy.set_timestep(t)

    def step(self, image, gripper, input_ids, attention_mask,
             state: Optional[jnp.ndarray] = None) -> np.ndarray:
        if state is not None:
            feature = self.policy.step(image, gripper, input_ids,
                                       attention_mask, state=state)
        else:
            feature = self.policy.step(image, gripper, input_ids,
                                       attention_mask)
        hist = np.stack(list(self._hist)) if self.hist_len else \
            np.zeros((0, self.adim), np.float32)
        nhist = hist * self._scale + self._offset
        horizon = self.dcfg.horizon
        cond = np.zeros((1, horizon, self.adim), np.float32)
        cond[0, :self.hist_len] = nhist
        mask = np.zeros((1, horizon, self.adim), bool)
        mask[0, :self.hist_len] = True
        rng = jax.random.fold_in(self._base_rng, self._step_i)
        self._step_i += 1
        plan = np.asarray(self._sample(rng, jnp.asarray(cond),
                                       jnp.asarray(mask),
                                       jnp.asarray(feature)[None]))
        plan = (plan[0, self.hist_len:] - self._offset) / self._scale
        if self.future_act_len > 0:
            plan = plan[:self.future_act_len]
        else:
            # execute only the SUPERVISED rows: training masks the loss to
            # rows [hist, window) (train/losses.py cond/loss masks), so plan
            # rows past window - hist are unsupervised U-Net output — never
            # feed them to the env by default
            plan = plan[:max(1, self.cfg.window_size - self.hist_len)]
        # gripper binarize (eval_utils.py:418-419)
        plan[..., -1] = np.where(plan[..., -1] > 0.5, 1.0, -1.0)
        plan = plan.astype(np.float32)
        # the whole returned plan is executed by the rollout queue — record
        # it as action history (eval_utils.py:674 appends per env step)
        for a in plan:
            self._hist.append(a)
        return plan


class BatchedDiffusionSampler:
    """Batched-lane analogue of DiffusionSamplerPolicy for
    eval/batched_rollout.py (`--lanes` with head_type='diffusion').

    Wraps a ScanDeerPolicy whose batched dispatch returns per-lane
    conditioning FEATURES (the diffusion head's exit features); runs ONE
    vmapped reverse-diffusion program over all lanes per dispatch and turns
    it into per-lane (k, 7) action plans for the lockstep harness.

    Per-lane semantics match the sequential wrapper exactly:
      - each lane keeps its own executed-action history (inpainted into the
        cond rows, eval_utils.py:402-410) and its own monotonically
        increasing rng counter (rng = fold_in(base, count) — the sequential
        wrapper's `fold_in(self._base_rng, self._step_i)`), so a lane's
        plan depends only on (its features, its history, its counter),
        never on which other lanes share the batch;
      - `reset_streams(mask)` zeroes the masked lanes' histories (the
        sequential `reset()`; counters keep running, as `reset()` never
        reset `_step_i`).

    Exposes the harness policy surface (cfg / thresholds /
    set_threshold_array / dispatch_batch / finish_batch / step_batch /
    reset_streams / reset); unknown attributes delegate to the inner
    engine.  `copy.copy` (the harness's per-pipeline-group policy split)
    shallow-copies the inner engine (shared compiled programs, independent
    carries) and gives the copy fresh host-side lane state.
    """

    def __init__(self, policy, params: dict, future_act_len: int = -1,
                 seed: int = 0, sample_steps: int = 0, ddim_eta: float = 0.0):
        assert policy.cfg.head_type == "diffusion", policy.cfg.head_type
        self.policy = policy
        self.cfg = policy.cfg
        dcfg = diffusion_head_config(self.cfg)
        self.dcfg = dcfg
        self.hist_len = self.cfg.n_obs_steps - 1
        self.future_act_len = future_act_len
        self.adim = dcfg.input_dim
        norm = params["diffusion"]["norm"]
        self._scale = np.asarray(norm["scale"], np.float32)
        self._offset = np.asarray(norm["offset"], np.float32)
        unet = params["diffusion"]["unet"]
        buf = ddpm_buffers(dcfg)
        base_rng = jax.random.PRNGKey(seed)

        def one(count, cond_row, mask_row, feat_row):
            rng = jax.random.fold_in(base_rng, count)
            if sample_steps and sample_steps > 0:
                out = conditional_sample_ddim(
                    unet, buf, rng, cond_row[None], mask_row[None], dcfg,
                    global_cond=feat_row[None], steps=sample_steps,
                    eta=ddim_eta)
            else:
                out = conditional_sample(unet, buf, rng, cond_row[None],
                                         mask_row[None], dcfg,
                                         global_cond=feat_row[None])
            return out[0]

        self._sample = jax.jit(jax.vmap(one))
        self._hist: Optional[np.ndarray] = None   # (B, hist_len, adim)
        self._counts: Optional[np.ndarray] = None  # (B,) int32 rng counters

    # -- host lane state ------------------------------------------------

    def _ensure_lanes(self, b: int) -> None:
        if self._hist is None or self._hist.shape[0] != b:
            self._hist = np.zeros((b, self.hist_len, self.adim), np.float32)
            self._counts = np.zeros(b, np.int32)

    def reset(self):
        self.policy.reset()
        self._hist = None
        self._counts = None

    def reset_streams(self, stream_mask) -> None:
        self.policy.reset_streams(stream_mask)
        if self._hist is not None:
            m = np.asarray(stream_mask, bool)
            self._hist[m] = 0.0  # episode-start zero history

    def __copy__(self):
        import copy as _copy
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new.policy = _copy.copy(self.policy)
        new._hist = None
        new._counts = None
        return new

    def __getattr__(self, name):
        # delegate the rest of the engine surface (thresholds,
        # set_threshold_array, steps_per_stage, ...) to the inner policy
        if name.startswith("_") or name == "policy":
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "policy"), name)

    # -- harness surface --------------------------------------------------

    def dispatch_batch(self, image, gripper, input_ids, attention_mask,
                       state=None, active=None):
        """Async half: launches the backbone program AND chains the vmapped
        sampler on its feature handle (no host sync — the per-lane cond /
        mask inpainting is built from host histories available now).

        active (optional bool (B,)): lanes marked False are PARKED — live
        streams riding along on zero rows (the HTTP micro-batcher's
        skipped-window lanes).  Their rng counters do not advance here and
        finish_batch leaves their histories untouched, so skipping a
        window never mutates a stream."""
        feats, _grip, exit_layer = self.policy.dispatch_batch(
            image, gripper, input_ids, attention_mask, state)
        b = feats.shape[0]
        self._ensure_lanes(b)
        horizon = self.dcfg.horizon
        cond = np.zeros((b, horizon, self.adim), np.float32)
        cond[:, :self.hist_len] = self._hist * self._scale + self._offset
        mask = np.zeros((b, horizon, self.adim), bool)
        mask[:, :self.hist_len] = True
        plans = self._sample(jnp.asarray(self._counts), jnp.asarray(cond),
                             jnp.asarray(mask), feats)
        act = (np.ones(b, bool) if active is None
               else np.asarray(active, bool))
        self._counts = self._counts + act.astype(np.int32)
        return plans, exit_layer, act

    def finish_batch(self, handles):
        """Blocking half: sampled trajectories -> per-lane (k, 7) plans;
        executed rows recorded into each active lane's history (the
        sequential wrapper's `self._hist.append` per plan row)."""
        plans_d, exit_layer, act = handles
        plans = np.asarray(plans_d, np.float32)
        plans = (plans[:, self.hist_len:] - self._offset) / self._scale
        if self.future_act_len > 0:
            plans = plans[:, :self.future_act_len]
        else:
            # only the SUPERVISED rows (train/losses.py masks rows
            # [hist, window)) — same default as the sequential wrapper
            plans = plans[:, :max(1, self.cfg.window_size - self.hist_len)]
        plans[..., -1] = np.where(plans[..., -1] > 0.5, 1.0, -1.0)
        k = plans.shape[1]
        if self.hist_len:
            if k >= self.hist_len:
                new_hist = plans[:, k - self.hist_len:k]
            else:
                new_hist = np.concatenate([self._hist[:, k:], plans], axis=1)
            self._hist = np.where(act[:, None, None], new_hist, self._hist)
        return plans, np.asarray(exit_layer).astype(np.int64)

    def step_batch(self, image, gripper, input_ids, attention_mask,
                   state=None, active=None):
        return self.finish_batch(self.dispatch_batch(
            image, gripper, input_ids, attention_mask, state, active))
