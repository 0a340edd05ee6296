"""Two-phase "post strategy" trainer — the driver loop of
train_calvin_post_strategy.py:30-694 re-built around the jitted train step.

Phases (train_calvin_post_strategy.py:644-660):
  epochs [0, num_joint_epochs)                 — joint: backbone + heads
  epochs [num_joint_epochs, +num_exit_epochs)  — exit-only: backbone frozen
    (stop_gradient in the forward, optax.set_to_zero on backbone leaves,
    mirroring DDP find_unused_parameters + requires_grad juggling)

Each phase has its own optimizer + schedule (two AdamW optimizers,
train_calvin_post_strategy.py:535-585); auto-resume picks the newest
checkpoint and restores the right phase optimizer (:589-629).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.data.preprocess import preprocess_train_frames
from deer_vla_tpu.data.text import fixed_length
from deer_vla_tpu.models.flamingo import (checkpoint_mask, init_deer,
                                          trainable_mask)
from deer_vla_tpu.train.checkpoint import (find_latest_checkpoint,
                                           load_checkpoint, save_checkpoint)
from deer_vla_tpu.train.optimizer import adaptive_lr, make_optimizer
from deer_vla_tpu.train.train_step import (TrainState, init_train_state,
                                           make_train_step)


@dataclass
class TrainConfig:
    run_dir: str = "runs/deer"
    num_joint_epochs: int = 4
    num_exit_epochs: int = 5
    joint_lr: float = 1e-4
    exit_lr: float = 2.5e-4
    joint_warmup_steps: int = 2500
    exit_warmup_steps: int = 2500
    joint_scheduler: str = "constant"
    exit_scheduler: str = "constant"
    weight_decay: float = 0.1
    exit_lr_scale: float = 1.0
    exit_decay: bool = False
    gradient_accumulation_steps: int = 1
    batch_size: int = 6
    world_size: int = 1
    rgb_pad: int = 10
    gripper_pad: int = 4
    traj_cons: bool = True
    real_data: bool = False
    # gripper-BCE weight; None = the reference rule (0.05 for real data,
    # else 0.01 — train_utils.py:314-316)
    bin_coef: Optional[float] = None
    save_every_epoch: bool = True
    # save an epoch checkpoint only when epoch % save_freq == 0
    # (--save_freq, train_calvin_post_strategy.py:688); the final epoch is
    # always saved so auto-resume/eval have a terminal artifact
    save_freq: int = 1
    # scales the CALVIN imitation loss before the gradient (the reference's
    # --loss_multiplier_calvin, train_utils.py:322,549); the logged loss is
    # post-multiplier, matching the reference's loss_calvin log
    loss_multiplier_calvin: float = 1.0
    # >0: also checkpoint every N optimizer steps within an epoch
    # (--save_every_iter, train_utils.py:626-628)
    save_every_iter: int = -1
    logging_steps: int = 100
    seed: int = 42
    # liveness file for scripts/launch_elastic.py (empty = disabled); the
    # default lands under run_dir at Trainer init
    heartbeat_path: str = ""
    # --tcp_rel: train on tool-center-point-frame relative actions
    # (labels converted world->tcp with robot_obs, train_utils.py:462-465);
    # eval must pass the matching --tcp_rel so actions convert back
    tcp_rel: bool = False
    # cast frozen leaves to bf16 (no fp32 master needed without updates) —
    # what lets the 3B joint phase fit one 16GB chip
    bf16_frozen: bool = True
    # >0: exponential moving average of the TRAINABLE leaves (standard
    # practice for diffusion policy heads; the reference has no EMA).  Each
    # epoch/iter checkpoint gains a sibling <name>_ema.ckpt with EMA weights
    # merged over the frozen backbone — evaluate it like any checkpoint.
    # Tracked as a flat leaf subset, so no full-tree HBM copy at 3B.
    # Resume restarts the average from the resumed params.
    ema_decay: float = 0.0

    @property
    def num_epochs(self) -> int:
        return self.num_joint_epochs + self.num_exit_epochs


import functools


@functools.lru_cache(maxsize=8)
def _jitted_prep(rgb_pad, gripper_pad, traj_cons, window, size,
                 gripper_size=None):
    return jax.jit(functools.partial(
        preprocess_train_frames, rgb_pad=rgb_pad, gripper_pad=gripper_pad,
        traj_cons=traj_cons, window=window, size=size,
        gripper_size=gripper_size))


def prepare_batch(raw: Dict[str, np.ndarray], cfg: DeerConfig, rng,
                  tcfg: TrainConfig) -> Dict[str, jnp.ndarray]:
    """Raw loader batch -> device batch (preprocess+aug on device,
    the host->device flatten of train_utils.py:441-478)."""
    w = cfg.window_size
    stat = raw["rgb_static"].reshape(-1, *raw["rgb_static"].shape[2:])
    grip = raw["rgb_gripper"].reshape(-1, *raw["rgb_gripper"].shape[2:])
    prep = _jitted_prep(tcfg.rgb_pad, tcfg.gripper_pad, tcfg.traj_cons, w,
                        cfg.vit.image_size, cfg.gripper_res or None)
    img, gri = prep(rng, jnp.asarray(stat), jnp.asarray(grip))
    bs = raw["input_ids"].shape[0]
    s = raw["input_ids"].shape[-1]
    if cfg.fusion_mode == "vit_concat":
        # text stays per-WINDOW in this mode — the decoder runs batch B with
        # the frames folded into the media token dim (train_utils.py:240-251)
        ids, mask = raw["input_ids"], raw["attention_mask"]
    else:
        ids = np.repeat(raw["input_ids"][:, None], w, axis=1).reshape(bs * w, s)
        mask = np.repeat(raw["attention_mask"][:, None], w, axis=1).reshape(bs * w, s)
    ids, mask = fixed_length(ids, mask, cfg.text_len, 0)
    labels = jnp.asarray(raw["actions"][:, :w])
    if tcfg.tcp_rel and "robot_obs" in raw:
        # world-frame rel labels -> tcp-frame (train_utils.py:462-465);
        # for (B, W, k, 7) multi-step labels the frame state broadcasts
        # over k (the reference repeats state_tensor the same way)
        from deer_vla_tpu.utils.tcp import world_to_tcp_frame
        ro = jnp.asarray(np.asarray(raw["robot_obs"])[:, :w], jnp.float32)
        if labels.ndim == 4:
            ro = jnp.broadcast_to(ro[:, :, None],
                                  labels.shape[:3] + (ro.shape[-1],))
        labels = world_to_tcp_frame(labels, ro)
    batch = {
        "image": img, "gripper": gri,
        "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
        "labels": labels,
    }
    if (cfg.use_state or cfg.head.use_state) and "robot_obs" in raw:
        # proprio state -> (B*W, 1, 1, state_dim) for encode_vision's
        # state_fc token and the head's embed_state (flamingo.py:120-126)
        st = np.asarray(raw["robot_obs"])[:, :w].reshape(bs * w, -1)
        if cfg.clip_state:
            # arm pose + gripper only (train_utils.py:253-255)
            st = np.concatenate([st[:, :6], st[:, -1:]], -1)
        batch["state"] = jnp.asarray(st[:, None, None, :], jnp.float32)
    return batch


def prepare_vl_batch(raw: Dict[str, np.ndarray], cfg: DeerConfig
                     ) -> Dict[str, jnp.ndarray]:
    """Caption/VQA raw batch -> device batch for the co-training LM loss."""
    from deer_vla_tpu.data.preprocess import clip_preprocess
    img = clip_preprocess(jnp.asarray(raw["image"]), cfg.vit.image_size)
    ids, mask = fixed_length(raw["input_ids"], raw["attention_mask"],
                             cfg.text_len, 0)
    out = {"image": img[:, None, None],
           "input_ids": jnp.asarray(ids),
           "attention_mask": jnp.asarray(mask)}
    if "answer_mask" in raw:
        am, _ = fixed_length(raw["answer_mask"], raw["answer_mask"],
                             cfg.text_len, 0)
        out["answer_mask"] = jnp.asarray(am)
    return out


def fit_action_normalizer(params: dict, loader, max_actions: int = 10000,
                          mode: str = "limits") -> dict:
    """Fit the diffusion head's LinearNormalizer affine on dataset actions
    (train_calvin_post_strategy.py:457-461: normalizer.fit(all_actions,
    last_n_dims=1, mode='limits') over ~10k stacked actions) and write it
    into params['diffusion']['norm'].  Pure: returns an updated copy."""
    if "diffusion" not in params:
        return params
    from deer_vla_tpu.models.normalizer import SingleFieldLinearNormalizer
    acts, n = [], 0
    for raw in loader:
        a = np.asarray(raw["actions"], np.float32)
        acts.append(a.reshape(-1, a.shape[-1]))
        n += acts[-1].shape[0]
        if n >= max_actions:
            break
    norm = SingleFieldLinearNormalizer().fit(
        np.concatenate(acts, axis=0), mode=mode)
    out = dict(params)
    out["diffusion"] = dict(params["diffusion"])
    out["diffusion"]["norm"] = {
        "scale": jnp.asarray(norm.params["scale"], jnp.float32),
        "offset": jnp.asarray(norm.params["offset"], jnp.float32)}
    return out


class Trainer:
    def __init__(self, cfg: DeerConfig, tcfg: TrainConfig, loader,
                 params: Optional[dict] = None,
                 log_fn: Optional[Callable[[Dict], None]] = None,
                 vl_loader=None, vl_weight: float = 1.0):
        self.cfg = cfg
        self.tcfg = tcfg
        self.loader = loader
        self.vl_loader = vl_loader   # co-training (--cotrain)
        self.vl_weight = vl_weight
        self.log_fn = log_fn or (lambda d: None)
        from deer_vla_tpu.utils.heartbeat import Heartbeat
        self.heartbeat = Heartbeat(
            tcfg.heartbeat_path
            or os.path.join(tcfg.run_dir, "heartbeat.json"))
        # SEED CONTRACT: the sidecar's meta seed S means the frozen backbone
        # is init_deer(PRNGKey(S)) — exactly what cli/eval.load_model
        # reconstructs before overlaying the trainable delta.  (A previous
        # split() here meant every delta ckpt was evaluated over a DIFFERENT
        # random backbone than it was trained on.)  The training rng stream
        # is fold_in(1) so dropout/sampling draws never reuse the init key.
        self.rng = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed), 1)
        if params is None:
            params = init_deer(jax.random.PRNGKey(tcfg.seed), cfg)
        if tcfg.bf16_frozen and cfg.dtypes.compute_dtype == "bfloat16":
            from deer_vla_tpu.models.flamingo import cast_frozen_to_bf16
            params = cast_frozen_to_bf16(
                params, trainable_mask(params, cfg, "joint"))
        if cfg.head_type == "diffusion":
            # fit the LinearNormalizer on dataset actions before training
            # (train_calvin_post_strategy.py:457-461 fits 'limits' mode on
            # 10k stacked actions); runs AFTER the bf16 cast so the fitted
            # affine stays fp32
            params = fit_action_normalizer(params, loader)
        self.params = params
        steps_per_epoch = len(loader)
        bin_coef = (tcfg.bin_coef if tcfg.bin_coef is not None
                    else (0.05 if tcfg.real_data else 0.01))
        self._phases = {}
        for phase, lr, warm, sched, n_ep in (
                ("joint", tcfg.joint_lr, tcfg.joint_warmup_steps,
                 tcfg.joint_scheduler, tcfg.num_joint_epochs),
                ("exit_only", tcfg.exit_lr, tcfg.exit_warmup_steps,
                 tcfg.exit_scheduler, tcfg.num_exit_epochs)):
            lr = adaptive_lr(lr, tcfg.batch_size, tcfg.world_size)
            mask = trainable_mask(params, cfg, phase if phase == "joint" else "exit_only")
            opt = make_optimizer(
                params, cfg, phase=phase, learning_rate=lr,
                warmup_steps=warm, total_steps=max(1, steps_per_epoch * n_ep),
                scheduler=sched, weight_decay=tcfg.weight_decay,
                exit_lr_scale=tcfg.exit_lr_scale, exit_decay=tcfg.exit_decay,
                trainable=mask)
            if vl_loader is not None:
                from deer_vla_tpu.train.train_step import make_cotrain_step
                step = make_cotrain_step(
                    cfg, opt, phase=phase,
                    bin_coef=bin_coef,
                    vl_weight=vl_weight,
                    calvin_multiplier=tcfg.loss_multiplier_calvin,
                    grad_accum=tcfg.gradient_accumulation_steps,
                    trainable=mask)
            else:
                step = make_train_step(
                    cfg, opt, phase=phase,
                    bin_coef=bin_coef,
                    calvin_multiplier=tcfg.loss_multiplier_calvin,
                    grad_accum=tcfg.gradient_accumulation_steps,
                    trainable=mask)
            self._phases[phase] = (opt, step)
        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        self._ema = None
        self._ema_sel = None
        if tcfg.ema_decay > 0:
            assert 0.0 < tcfg.ema_decay < 1.0, tcfg.ema_decay
            mask_leaves = jax.tree_util.tree_leaves(
                checkpoint_mask(self.params, self.cfg))
            self._ema_sel = [i for i, m in enumerate(mask_leaves) if m]
            d = float(tcfg.ema_decay)
            self._ema_update = jax.jit(lambda e, p: [
                d * ev + (1.0 - d) * pv.astype(ev.dtype)
                for ev, pv in zip(e, p)])
            # fresh output buffers: the train step DONATES its state, so
            # aliasing state.params leaves would leave the EMA holding
            # deleted arrays one step later
            self._ema_seed = jax.jit(
                lambda p: [v.astype(jnp.float32) + 0.0 for v in p])

    def _ema_step(self):
        leaves = jax.tree_util.tree_leaves(self.state.params)
        sel = [leaves[i] for i in self._ema_sel]
        if self._ema is None:  # first step (or post-resume) seed
            self._ema = self._ema_seed(sel)
            return
        self._ema = self._ema_update(self._ema, sel)

    def _ema_params(self) -> dict:
        """Current params with EMA values merged over the tracked leaves."""
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        for j, i in enumerate(self._ema_sel):
            leaves[i] = self._ema[j].astype(leaves[i].dtype)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def phase_of_epoch(self, epoch: int) -> str:
        return "joint" if epoch < self.tcfg.num_joint_epochs else "exit_only"

    def maybe_resume(self) -> int:
        ck = find_latest_checkpoint(self.tcfg.run_dir)
        if ck is None:
            return 0
        self.params, _, meta = load_checkpoint(ck, self.params)
        md = meta.get("meta", {})
        ep = int(md.get("epoch", -1))
        # mid-epoch ckpt (has "step"): re-run that epoch from its start
        # (deterministic reshuffle) instead of skipping its remainder
        self.start_epoch = ep if md.get("step") is not None else ep + 1
        # remember the ckpt so train() can restore the phase optimizer state
        # (Adam moments + schedule count) once the phase template exists —
        # the reference restores optimizer.state_dict() the same way
        # (train_calvin_post_strategy.py:589-629)
        self._resume_ckpt = ck
        self._resume_phase = meta.get("meta", {}).get("phase")
        return self.start_epoch

    def train(self, num_epochs: Optional[int] = None) -> Dict:
        tcfg = self.tcfg
        num_epochs = num_epochs or tcfg.num_epochs
        if len(self.loader) == 0:
            raise ValueError(
                "empty loader: dataset yields 0 batches at batch_size="
                f"{tcfg.batch_size} (len(dataset)*data_percent too small?)")
        last_metrics: Dict = {}
        metrics: Dict = {}
        cur_phase = None
        for epoch in range(self.start_epoch, num_epochs):
            phase = self.phase_of_epoch(epoch)
            if phase != cur_phase:
                opt, step = self._phases[phase]
                self.state = init_train_state(self.params, opt)
                self._step_fn = step
                if (cur_phase is None
                        and getattr(self, "_resume_ckpt", None)
                        and self._resume_phase == phase):
                    _, opt_state, _ = load_checkpoint(
                        self._resume_ckpt, self.params,
                        opt_state_template=self.state.opt_state)
                    if opt_state is not None:
                        self.state = self.state._replace(opt_state=opt_state)
                cur_phase = phase
            self.loader.set_epoch(epoch)
            t0 = time.time()
            vl_iter = iter(self.vl_loader) if self.vl_loader is not None else None
            for it, raw in enumerate(self.loader):
                self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
                batch = prepare_batch(raw, self.cfg, prep_rng, tcfg)
                if vl_iter is not None:
                    try:
                        vl_raw = next(vl_iter)
                    except StopIteration:
                        vl_iter = iter(self.vl_loader)
                        vl_raw = next(vl_iter)
                    vl_batch = prepare_vl_batch(vl_raw, self.cfg)
                    self.state, metrics = self._step_fn(self.state, batch,
                                                        vl_batch, step_rng)
                else:
                    self.state, metrics = self._step_fn(self.state, batch,
                                                        step_rng)
                if self._ema_sel is not None:
                    self._ema_step()
                self.heartbeat.beat(epoch=epoch, step=it, phase=phase)
                if (tcfg.save_every_iter > 0
                        and (it + 1) % tcfg.save_every_iter == 0):
                    # mid-epoch checkpoint (train_utils.py:626-628); params
                    # come from the live train state so the delta is current.
                    # Named deer_{E}_it{N} — resume re-runs epoch E from its
                    # start (deterministic reshuffle) rather than silently
                    # skipping its remainder.
                    self.params = self.state.params
                    self.save(epoch, step=it + 1)
                if (it + 1) % tcfg.logging_steps == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()
                                    if np.ndim(v) == 0}
                    self.log_fn({"epoch": epoch, "step": it, "phase": phase,
                                 **last_metrics})
            self.params = self.state.params
            last_metrics = {k: float(v) for k, v in metrics.items()
                            if np.ndim(v) == 0}
            last_metrics.update(epoch=epoch, phase=phase,
                                epoch_time=time.time() - t0)
            self.log_fn(last_metrics)
            if tcfg.save_every_epoch and (
                    epoch % max(1, tcfg.save_freq) == 0
                    or epoch == num_epochs - 1):
                self.save(epoch)
        return last_metrics

    def save(self, epoch: int, step: Optional[int] = None) -> str:
        phase = self.phase_of_epoch(epoch)
        # always persist head + backbone-trainable leaves (joint mask is the
        # superset — matches trainable-only ckpts, train_utils.py:631-638)
        # plus data-fit buffers (diffusion normalizer)
        mask = checkpoint_mask(self.params, self.cfg)
        name = f"deer_{epoch}" if step is None else f"deer_{epoch}_it{step}"
        path = os.path.join(self.tcfg.run_dir, name)
        meta = {"epoch": epoch, "phase": phase, "seed": self.tcfg.seed}
        if step is not None:
            meta["step"] = step
        # seed lets eval reconstruct the SAME frozen backbone before the
        # trainable-delta overlay; opt_state makes resume exact (Adam
        # moments + schedule count survive preemption)
        out = save_checkpoint(path, self.params, self.cfg, meta=meta,
                              trainable_mask=mask,
                              opt_state=None if self.state is None
                              else self.state.opt_state)
        if self._ema_sel is not None and self._ema is not None:
            save_checkpoint(path + "_ema", self._ema_params(), self.cfg,
                            meta=dict(meta, ema_decay=self.tcfg.ema_decay),
                            trainable_mask=mask)
        return out
