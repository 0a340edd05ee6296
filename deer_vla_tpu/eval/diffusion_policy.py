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
