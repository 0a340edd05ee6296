"""Micro-batching serving core: concurrent robot streams share ONE batched
dynamic-exit program per device step.

The per-stream serving core (serving/server.py DeerActionServer) dispatches
one B=1 program per request — right for latency, but a single chip
sustains ~2x the aggregate throughput at B=32 (bench.py batched32).  This
core multiplexes HTTP streams onto the lanes of one ScanDeerPolicy batch:
requests arriving within a small window are collated into one
``step_batch`` dispatch (parked lanes ride along as zeros), and every
lane keeps its own LSTM carry row, threshold row (per-stream runtime
thresholds) and token cache.

Same HTTP protocol as DeerActionServer (make_server takes either core);
`deer-serve --batch_lanes N [--batch_window_ms W]` selects this core.

Window-folded models (vit_concat / use_hist) batch too: each lane keeps a
rolling W-frame window of preprocessed frames (the per-stream adapter's
img_queue, reference eval_utils.py:344-386) fed as W stream-major batch
rows, with use_hist goal text tiled per frame.  Proprio models
(--use_state) send ``robot_obs`` per request (same key as the per-stream
core); rows ride the frame window for folded modes.

Heads: deterministic LSTM, or diffusion via a BatchedDiffusionSampler
(per-lane DDPM/DDIM plan sampling around the batched feature program —
clients receive (k, 7) plans under the same "action" key).  fc/gpt heads
use the per-stream core.

Stage reuse (steps_per_stage>1, reference value_net.py:284-286): the
batcher keeps a per-lane step counter and last exit; mid-stage dispatches
force each lane's previous exit through its threshold row — the same
per-stream-row mechanism as eval/batched_rollout.py, so lanes on
different stage phases batch together.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import numpy as np

from deer_vla_tpu.serving.server import ServeError, _decode_image


class _Pending:
    __slots__ = ("payload", "event", "result", "error")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        # ServeError -> HTTP 400; anything else (engine/device failure)
        # re-raises raw so make_server maps it to 500
        self.error: Optional[BaseException] = None


class BatchedActionServer:
    """Lane-multiplexed serving core around one ScanDeerPolicy.

    policy: ScanDeerPolicy built for this config; its batched carry and
            (B, n_layers) threshold rows hold ALL streams' state.
    lanes:  fixed stream capacity == the compiled batch size.
    window_ms: after the first pending request arrives, wait at most this
            long for more before dispatching (0 = dispatch immediately
            with whatever is queued)."""

    def __init__(self, policy, text_fn, lanes: int = 8,
                 window_ms: float = 5.0):
        import functools

        import jax
        import jax.numpy as jnp

        from deer_vla_tpu.data.preprocess import clip_preprocess
        from deer_vla_tpu.eval.diffusion_policy import BatchedDiffusionSampler
        cfg = policy.cfg
        # diffusion heads batch through the BatchedDiffusionSampler wrapper
        # (per-lane histories/rng around the batched feature program);
        # clients receive (k, 7) plans under the usual "action" key
        self._diff = isinstance(policy, BatchedDiffusionSampler)
        if cfg.head_type != "deterministic" and not self._diff:
            raise ServeError("batched serving covers the deterministic "
                             "LSTM head and diffusion heads (via "
                             "BatchedDiffusionSampler); fc/gpt heads use "
                             "the per-stream core")
        self._policy = policy
        # engine-internal surgery (carry rows, _ensure_carry) targets the
        # inner ScanDeerPolicy — setattr on the wrapper would shadow its
        # delegation instead of writing the engine's carry
        self._engine = policy.policy if self._diff else policy
        self._text_fn = text_fn
        self.cfg = cfg
        self.lanes = lanes
        self.window_s = window_ms / 1000.0
        self.max_streams = lanes
        size = cfg.vit.image_size
        self._prep = jax.jit(functools.partial(clip_preprocess, size=size))
        gsize = cfg.gripper_res or size
        # native-res gripper (cfg.gripper_res): wrist frames prep to their
        # own (smaller) size
        self._prep_grip = (self._prep if gsize == size else
                           jax.jit(functools.partial(clip_preprocess,
                                                     size=gsize)))
        self._jnp = jnp

        # lane state (all guarded by _cond's lock)
        self._lane_of: Dict[str, int] = {}
        self._free: List[int] = list(range(lanes))
        th = np.asarray(policy.thresholds, np.float32)
        self._default_row = (th if th.ndim == 1 else th[0]).copy()
        self._rows = np.tile(self._default_row, (lanes, 1))
        # stage reuse (value_net.py:284-286): a lane recomputes its exit
        # every steps_per_stage steps; mid-stage its previous exit is
        # forced through the lane's threshold row (the batched rollout's
        # per-stream-row mechanism) — lanes on different stage phases
        # share one dispatch
        self._sps = int(getattr(self._engine, "steps_per_stage", 1) or 1)
        self._lane_step = np.zeros(lanes, np.int64)
        self._lane_last_exit = np.full(lanes, -1, np.int64)
        # a parked lane (no request this window) must exit at the FIRST
        # exit layer so it never prolongs the batch's while_loop; its
        # result and carry are discarded/restored anyway
        self._park_row = policy.threshold_row(
            {e: (1e30 if e == policy.exits[0] else -1e30)
             for e in policy.exits})
        # window-folded serving: per-lane rolling W-frame windows of
        # PREPROCESSED frames (empty = fresh; left-padded with the first
        # frame on the lane's first step, eval_utils.py:344-349)
        self._folded_w = (cfg.window_size
                          if (cfg.use_hist or cfg.fusion_mode == "vit_concat")
                          else 0)
        self._tile_text = cfg.use_hist
        self._use_state = cfg.use_state or cfg.head.use_state
        self._win_rgb: List[list] = [[] for _ in range(lanes)]
        self._win_grip: List[list] = [[] for _ in range(lanes)]
        self._win_state: List[list] = [[] for _ in range(lanes)]
        # materialize the batched carry up front so parked-lane restoration
        # has a base on the very first dispatch (text rows are per-frame
        # under use_hist — _ensure_carry divides back to lane rows)
        self._engine._ensure_carry(lanes * (self._folded_w
                                            if cfg.use_hist else 1))
        self._tok_cache: Dict[str, tuple] = {}
        self._tok_cache_cap = 512  # oldest-out; unbounded growth = OOM
        self._pending: Dict[int, _Pending] = {}  # lane -> request
        self._cond = threading.Condition()
        self._stop = False
        # True while the batcher thread is between taking a batch and
        # restoring parked-lane carries; reset/close wait it out so the
        # unconditional carry write-back can never clobber their mutation
        self._dispatching = False
        self.total_steps = 0
        # batched-exit waste (the while_loop runs all lanes to the deepest
        # exit): per dispatch, each live lane wastes (max_exit - own_exit)
        # layers.  Exposed via healthz as avg_wasted_layers_per_step.
        self._waste_layers = 0.0
        self._waste_steps = 0
        self.started = time.time()
        # parked lanes ride along on one shared preprocessed zero frame
        self._zero_prep = self._prep(
            jnp.asarray(np.zeros((1, size, size, 3), np.uint8)))[0]
        self._zero_prep_grip = self._prep_grip(
            jnp.asarray(np.zeros((1, gsize, gsize, 3), np.uint8)))[0]
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- stream management (lock held by caller paths) ----------------------

    def _lane(self, name: str) -> int:
        if not isinstance(name, str) or not name:
            raise ServeError("'stream' must be a non-empty string")
        lane = self._lane_of.get(name)
        if lane is None:
            if not self._free:
                raise ServeError(
                    f"stream limit {self.lanes} reached; close one")
            lane = self._free.pop(0)
            self._lane_of[name] = lane
            self._reset_lane(lane)
            # a freed lane may carry the previous stream's custom
            # thresholds (reset {"thresholds": ...}); new streams start
            # from the server defaults like a fresh per-stream clone
            self._rows[lane] = self._default_row
        return lane

    def _wait_not_dispatching(self):
        while self._dispatching and not self._stop:
            self._cond.wait()

    def _reset_lane(self, lane: int):
        self._policy.reset_streams(np.arange(self.lanes) == lane)
        self._win_rgb[lane] = []
        self._win_grip[lane] = []
        self._win_state[lane] = []
        self._lane_step[lane] = 0
        self._lane_last_exit[lane] = -1

    # -- endpoints (same surface as DeerActionServer) -----------------------

    def healthz(self) -> dict:
        with self._cond:
            streams = sorted(self._lane_of)
            steps = self.total_steps
            waste = (self._waste_layers / self._waste_steps
                     if self._waste_steps else 0.0)
        return {
            "ok": True,
            "mode": "batched",
            "avg_wasted_layers_per_step": round(waste, 3),
            "steps_per_stage": self._sps,
            "lanes": self.lanes,
            "exits": [int(e) for e in self._policy.exits],
            "n_layers": self.cfg.n_layers,
            "head_type": self.cfg.head_type,
            "quantize": getattr(self._policy, "quantize", None),
            "streams": streams,
            "steps": steps,
            "uptime_s": round(time.time() - self.started, 1),
        }

    def reset(self, payload: dict) -> dict:
        with self._cond:
            self._wait_not_dispatching()
            lane = self._lane(payload.get("stream", ""))
            if lane in self._pending:
                raise ServeError("stream busy (a step is in flight)")
            self._reset_lane(lane)
            th = payload.get("thresholds")
            if th is not None:
                exits = self._policy.exits
                if (not isinstance(th, list) or len(th) != len(exits)
                        or not all(isinstance(t, (int, float))
                                   for t in th)):
                    raise ServeError(
                        f"'thresholds' must be {len(exits)} numbers "
                        f"(exits {list(map(int, exits))})")
                self._rows[lane] = self._policy.threshold_row(th)
        return {"ok": True}

    def close(self, payload: dict) -> dict:
        with self._cond:
            self._wait_not_dispatching()
            lane = self._lane_of.pop(payload.get("stream", ""), None)
            if lane is not None:
                if lane in self._pending:
                    self._lane_of[payload["stream"]] = lane
                    raise ServeError("stream busy (a step is in flight)")
                self._free.append(lane)
        return {"ok": True, "existed": lane is not None}

    def step(self, payload: dict) -> dict:
        instruction = payload.get("instruction")
        if not isinstance(instruction, str) or not instruction.strip():
            raise ServeError("'instruction' must be a non-empty string")
        rgb = _decode_image(payload, "rgb")
        grip = _decode_image(payload, "gripper")
        state_row = None
        if self._use_state:
            # same request key as the per-stream core; accept raw CALVIN
            # robot_obs (clip_state trims to ee-pose + gripper like the
            # adapter) or the pre-clipped training layout
            ro = payload.get("robot_obs")
            if ro is None:
                raise ServeError("this model was trained with proprio "
                                 "state; send 'robot_obs': [floats]")
            ro = np.asarray(ro, np.float32).reshape(-1)
            if self.cfg.clip_state and ro.shape[0] != self.cfg.state_dim:
                ro = np.concatenate([ro[:6], ro[-1:]], -1)
            if ro.shape[0] != self.cfg.state_dim:
                raise ServeError(
                    f"'robot_obs' must have {self.cfg.state_dim} values "
                    "(after clip_state)")
            state_row = ro
        # preprocess on the REQUEST thread (clients send arbitrary HxW;
        # the batch stack needs uniform (3, size, size) tensors) — same
        # per-request device resize the per-stream core pays
        jnp = self._jnp
        rgb_p = self._prep(jnp.asarray(rgb)[None])[0]
        grip_p = self._prep_grip(jnp.asarray(grip)[None])[0]
        req = _Pending((instruction, rgb_p, grip_p, state_row))
        with self._cond:
            if self._stop:
                # the loop thread's final drain already ran (or will run
                # before any dispatch); enqueueing now would block forever
                raise ServeError("server shutting down")
            if self._lane_of.get(payload.get("stream", "")) is None:
                # NEW stream: lane allocation resets the lane's carry row,
                # and an in-flight dispatch's carry write-back (jnp.where
                # against a pre-reset old_carry) would clobber that reset —
                # the new stream would inherit the previous occupant's LSTM
                # state.  Existing streams skip the wait (their enqueue
                # touches no carries; that's the pipelining fast path).
                self._wait_not_dispatching()
                if self._stop:
                    raise ServeError("server shutting down")
            lane = self._lane(payload.get("stream", ""))
            if lane in self._pending:
                raise ServeError("stream busy (one step in flight per "
                                 "stream)")
            self._pending[lane] = req
            self._cond.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def shutdown(self):
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=5)

    # -- the batcher loop ---------------------------------------------------

    def _tokens(self, instruction: str):
        t = self._tok_cache.get(instruction)
        if t is None:
            from deer_vla_tpu.data.text import fixed_length
            ids, mask = self._text_fn([instruction])
            pad = getattr(self._text_fn, "pad_token_id", 0)
            ids, mask = fixed_length(ids, mask, self.cfg.text_len, pad)
            t = (np.asarray(ids[0]), np.asarray(mask[0]))
            while len(self._tok_cache) >= self._tok_cache_cap:
                self._tok_cache.pop(next(iter(self._tok_cache)))
            self._tok_cache[instruction] = t
        return t

    def _loop(self):
        jnp = self._jnp
        s = self.cfg.text_len
        while True:
            with self._cond:
                while not self._pending and not self._stop:
                    self._cond.wait()
                if self._stop:
                    for req in self._pending.values():
                        req.error = ServeError("server shutting down")
                        req.event.set()
                    return
                # micro-batch window: collect more requests until every
                # live stream has one or the window elapses
                deadline = time.time() + self.window_s
                while (len(self._pending) < len(self._lane_of)
                       and not self._stop):
                    left = deadline - time.time()
                    if left <= 0:
                        break
                    self._cond.wait(timeout=left)
                batch = dict(self._pending)
                self._pending.clear()
                rows = self._rows.copy()
                if self._sps > 1:
                    for lane in batch:
                        if (self._lane_step[lane] % self._sps != 0
                                and self._lane_last_exit[lane] >= 0):
                            rows[lane] = -1e30
                            rows[lane, self._lane_last_exit[lane]] = 1e30
                self._dispatching = True
            # build batch arrays OUTSIDE the lock (decode/step latency
            # must not block enqueues for the next window); the whole
            # build+dispatch is guarded so a bad request can never kill
            # the batcher thread, and _dispatching keeps reset/close out
            # until the carry write-back lands
            try:
                t0 = time.perf_counter()
                rep = self._folded_w or 1  # frame rows per lane
                imgs, grips, states = [], [], []
                trep = rep if self._tile_text else 1  # text rows per lane
                idss = np.zeros((self.lanes * trep, s), np.int32)
                masks = np.zeros((self.lanes * trep, s), np.int32)
                zero_state = (np.zeros(self.cfg.state_dim, np.float32)
                              if self._use_state else None)
                for lane in range(self.lanes):
                    req = batch.get(lane)
                    if req is not None:
                        instruction, rgb_p, grip_p, st = req.payload
                        if rep > 1:
                            # rolling W-frame window (left-padded with the
                            # lane's first frame; parked windows untouched)
                            if not self._win_rgb[lane]:
                                self._win_rgb[lane] = [rgb_p] * rep
                                self._win_grip[lane] = [grip_p] * rep
                                if self._use_state:
                                    self._win_state[lane] = [st] * rep
                            else:
                                self._win_rgb[lane] = (
                                    self._win_rgb[lane] + [rgb_p])[-rep:]
                                self._win_grip[lane] = (
                                    self._win_grip[lane] + [grip_p])[-rep:]
                                if self._use_state:
                                    self._win_state[lane] = (
                                        self._win_state[lane] + [st])[-rep:]
                            imgs.extend(self._win_rgb[lane])
                            grips.extend(self._win_grip[lane])
                            if self._use_state:
                                states.extend(self._win_state[lane])
                        else:
                            imgs.append(rgb_p)
                            grips.append(grip_p)
                            if self._use_state:
                                states.append(st)
                        ids, m = self._tokens(instruction)
                        idss[lane * trep:(lane + 1) * trep] = ids
                        masks[lane * trep:(lane + 1) * trep] = m
                    else:  # parked lane: zero rows, window untouched
                        imgs.extend([self._zero_prep] * rep)
                        grips.extend([self._zero_prep_grip] * rep)
                        if self._use_state:
                            states.extend([zero_state] * rep)
                in_batch = np.zeros(self.lanes, bool)
                in_batch[list(batch)] = True
                rows[~in_batch] = self._park_row
                img_d = jnp.stack(imgs)[:, None, None]
                grip_d = jnp.stack(grips)[:, None, None]
                self._engine.set_threshold_array(rows)
                old_carry = self._engine.carry
                st_d = (jnp.asarray(np.stack(states)[:, None, None, :])
                        if self._use_state else None)
                if self._diff:
                    # parked lanes' plan histories / rng counters are
                    # protected by the wrapper's active mask
                    acts, exits = self._policy.step_batch(
                        img_d, grip_d, jnp.asarray(idss),
                        jnp.asarray(masks), st_d, active=in_batch)
                else:
                    acts, exits = self._policy.step_batch(
                        img_d, grip_d, jnp.asarray(idss),
                        jnp.asarray(masks), st_d)
                # parked lanes rode along on zero frames: restore their
                # carry rows so skipping a window never mutates a stream
                m = jnp.asarray(in_batch)
                self._engine.carry = tuple(
                    jnp.where(m[None, :, None], new, old)
                    for new, old in zip(self._engine.carry, old_carry))
                dt = round(1000 * (time.perf_counter() - t0), 2)
                ex = np.asarray(exits, int)
                live = sorted(batch)
                batch_max = int(ex[live].max())  # parked lanes are forced
                # to the first exit (_park_row), so the device depth is the
                # live lanes' max
                for lane, req in batch.items():
                    req.result = {
                        "action": np.asarray(acts[lane]).tolist(),
                        "exit_layer": int(exits[lane]),
                        "batch_max_exit": batch_max,
                        "step_ms": dt,
                        "batched_with": len(batch),
                    }
                    req.event.set()
            except Exception as e:  # pragma: no cover - engine errors
                # raw (non-ServeError) so the HTTP layer answers 500,
                # not 400 — a device failure is not a client error
                for req in batch.values():
                    req.error = e
                    req.event.set()
            finally:
                with self._cond:
                    done = [(lane, r) for lane, r in batch.items()
                            if r.result is not None]
                    self.total_steps += len(done)
                    for lane, r in done:
                        self._waste_layers += (r.result["batch_max_exit"]
                                               - r.result["exit_layer"])
                        self._lane_last_exit[lane] = r.result["exit_layer"]
                        self._lane_step[lane] += 1
                    self._waste_steps += len(done)
                    self._dispatching = False
                    self._cond.notify_all()
