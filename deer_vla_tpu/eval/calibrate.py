"""Offline threshold calibration — generate_action_values + set_threshold
(value_net.py:185-272, 301-399) as one jitted batch program + numpy solver.

Pipeline: for each calibration batch, run the backbone once collecting all
layer outputs, sample random-layer history features (sampling strategy 1),
compute per-exit action deltas on device, then gather to host and solve the
thresholds from the target exit distribution.  The calibration deltas cache
is persisted in a sidecar (checkpoint.save_calibration_values) instead of the
reference's in-place ckpt['values'] mutation (eval_calvin.py:601-611).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.data.preprocess import preprocess_train_frames
from deer_vla_tpu.models.flamingo import forward_train
from deer_vla_tpu.models.value_net import (generate_exit_deltas,
                                           generate_streamed_exit_deltas,
                                           solve_thresholds)


def make_delta_fn(cfg: DeerConfig, threshold_type: str = "L2",
                  warm_prefix: int = 0, streamed: bool = False,
                  exit_sample_probs=None, warm_rounds: int = 1):
    """One jitted program: backbone (all layers) + calibration deltas.

    streamed=True swaps the random-prefix position scorer for the
    carry-matched streamed generator (value_net.generate_streamed_exit_deltas
    — thread one LSTM carry across the window, commit from an exit sampled
    from ``exit_sample_probs``), closing the calibrate/serve regime mismatch
    the streamed contract test measures."""
    exit_list = list(cfg.all_exit_ids())

    @jax.jit
    def delta_fn(params, image, gripper, input_ids, attention_mask, rng,
                 state=None):
        # state (proprio, --use_state models): calibration must run the
        # SAME forward as training/serving — omitting the state token here
        # silently skews the delta distribution the thresholds are solved on
        out = forward_train(params, image, input_ids, attention_mask, cfg, rng,
                            vision_gripper=gripper, state_tensor=state,
                            only_extra_exit=True, train=False)
        if streamed:
            return generate_streamed_exit_deltas(
                params["extra_exit"], out.hidden_states, cfg, exit_list,
                threshold_type, rng=rng,
                exit_sample_probs=exit_sample_probs, state=state,
                warm_rounds=warm_rounds)
        return generate_exit_deltas(
            params["extra_exit"], out.hidden_states, out.rand_layer_feat,
            cfg, exit_list, threshold_type, warm_prefix=warm_prefix,
            rng=rng, state=state)

    return delta_fn


def generate_calibration_values(params: dict, cfg: DeerConfig,
                                batches: Iterable[Dict[str, np.ndarray]],
                                *, rng=None, threshold_type: str = "L2",
                                max_batches: Optional[int] = None,
                                warm_prefix: int = 0,
                                streamed: bool = False,
                                exit_sample_probs=None,
                                warm_rounds: int = 1) -> np.ndarray:
    """Run the calibration pass over a loader of raw batches.

    Returns (n_exit, n_samples) deltas, host numpy.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    delta_fn = make_delta_fn(cfg, threshold_type, warm_prefix,
                             streamed=streamed,
                             exit_sample_probs=exit_sample_probs,
                             warm_rounds=warm_rounds)
    outs = []
    for bi, batch in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        rng, prep_rng, fwd_rng = jax.random.split(rng, 3)
        stat = batch["rgb_static"].reshape(-1, *batch["rgb_static"].shape[2:])
        grip = batch["rgb_gripper"].reshape(-1, *batch["rgb_gripper"].shape[2:])
        img, gri = preprocess_train_frames(
            prep_rng, jnp.asarray(stat), jnp.asarray(grip),
            rgb_pad=0, gripper_pad=0, window=cfg.window_size,
            size=cfg.vit.image_size, gripper_size=cfg.gripper_res or None)
        bsw = img.shape[0]
        s = batch["input_ids"].shape[-1]
        if cfg.fusion_mode == "vit_concat":
            # per-WINDOW text in this mode (train_utils.py:240-251)
            ids = np.asarray(batch["input_ids"])
            mask = np.asarray(batch["attention_mask"])
        else:
            ids = np.repeat(batch["input_ids"][:, None], cfg.window_size,
                            axis=1).reshape(bsw, s)
            mask = np.repeat(batch["attention_mask"][:, None],
                             cfg.window_size, axis=1).reshape(bsw, s)
        from deer_vla_tpu.data.text import fixed_length
        # pad to the static text_len so one compiled program serves all
        # batches (padding ids are masked out by attention_mask)
        ids2, mask2 = fixed_length(ids, mask, cfg.text_len, 0)
        state = None
        if (cfg.use_state or cfg.head.use_state) and "robot_obs" in batch:
            # (B*W, 1, 1, state_dim) proprio rows, exactly like training
            # (trainer.prepare_batch) and serving (CalvinPolicyAdapter)
            w = cfg.window_size
            st = np.asarray(batch["robot_obs"])[:, :w].reshape(bsw, -1)
            if cfg.clip_state:
                # arm pose + gripper only (train_utils.py:253-255)
                st = np.concatenate([st[:, :6], st[:, -1:]], -1)
            state = jnp.asarray(st[:, None, None, :], jnp.float32)
        d = delta_fn(params, img, gri, jnp.asarray(ids2), jnp.asarray(mask2),
                     fwd_rng, state)
        # fp32 at source: under bf16 compute some head types return bf16
        # deltas, which the numpy solver + npz sidecar can't round-trip
        outs.append(np.asarray(d, np.float32))
    return np.concatenate(outs, axis=1)


def calibrate(params: dict, cfg: DeerConfig,
              batches: Iterable[Dict[str, np.ndarray]], exit_ratio: float,
              *, max_layer: Optional[int] = None, exit_dist: str = "exp",
              model_name: str = "mpt_dolly_3b", threshold_type: str = "L2",
              values: Optional[np.ndarray] = None,
              all_gather: Optional[Callable[[np.ndarray], np.ndarray]] = None,
              max_batches: Optional[int] = None, warm_prefix: int = 0,
              streamed: bool = False
              ) -> Tuple[Dict[int, float], np.ndarray]:
    """Full set_threshold flow.  ``values`` short-circuits generation (the
    reference's ckpt['values'] cache); ``all_gather`` hooks multi-host
    concatenation (torch all_gather equivalent, value_net.py:195-201).

    streamed=True runs the carry-matched streamed generator with commit
    exits sampled from THIS exit_ratio/dist's target distribution, so the
    calibration carries follow the mix the solved thresholds will realize."""
    if values is None:
        esp = None
        if streamed:
            from deer_vla_tpu.models.value_net import exit_probs
            ml0 = max_layer if max_layer is not None else cfg.n_layers
            exits = list(cfg.all_exit_ids())
            live = [e for e in exits if e <= ml0 - 1] or exits[:1]
            p = exit_probs(len(live), exit_ratio, exit_dist, model_name)
            esp = list(p) + [0.0] * (len(exits) - len(live))
        values = generate_calibration_values(
            params, cfg, batches, threshold_type=threshold_type,
            max_batches=max_batches, warm_prefix=warm_prefix,
            streamed=streamed, exit_sample_probs=esp)
        if all_gather is not None:
            values = all_gather(values)
    ml = max_layer if max_layer is not None else cfg.n_layers
    thresholds, probs = solve_thresholds(
        values, exit_ratio, list(cfg.all_exit_ids()), ml - 1,
        exit_dist=exit_dist, model_name=model_name)
    return thresholds, values
