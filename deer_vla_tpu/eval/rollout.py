"""CALVIN rollout harness (host-side driver) + DebugEnv fake backend.

Port of eval_utils.py: make_env stays host-side (the CALVIN simulator is a
CPU/GL program; the TPU program only consumes rendered frames — SURVEY §2.9);
this module provides the env protocol, the fake DebugEnv
(eval_utils.py:152-175), the rollout loop (:625-687, EP_LEN=360), sequence
evaluation (:583-622) and multi-process sequence sharding (:521-527).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.data.preprocess import clip_preprocess
from deer_vla_tpu.eval.metrics import summarize
from deer_vla_tpu.eval.policy import DeerPolicy

EP_LEN = 360


# ---------------------------------------------------------------------------
# environments
# ---------------------------------------------------------------------------


class DebugEnv:
    """Fake CALVIN env (eval_utils.py:152-175): constant observations.

    ``dynamic=True`` makes observations depend on an internal state driven by
    the actions so closed-loop behavior (and success detection in
    DebugTaskOracle) is testable without the simulator.
    """

    def __init__(self, img_hw: int = 200, grip_hw: int = 84, dynamic: bool = True,
                 seed: int = 0, host_latency_ms: float = 0.0):
        self.img_hw, self.grip_hw = img_hw, grip_hw
        self.dynamic = dynamic
        # host_latency_ms simulates the CPU cost of a real simulator step
        # (CALVIN pybullet physics + EGL render, ~10-50 ms/step on a host
        # core) so --lanes/--pipeline overlap is quantifiable without the
        # simulator (scripts/bench_pipeline_overlap.py)
        self.host_latency_ms = host_latency_ms
        self._r = np.random.RandomState(seed)
        self.reset()

    def reset(self, robot_obs=None, scene_obs=None):
        self._state = np.zeros(15, np.float32)
        if robot_obs is not None:
            self._state[:len(robot_obs)] = np.asarray(robot_obs)[:15]
        self._progress = 0.0
        return self.get_obs()

    def get_obs(self) -> Dict:
        if self.dynamic:
            base = int(abs(self._state[:3].sum()) * 50) % 200
        else:
            base = 1
        img = np.full((self.img_hw, self.img_hw, 3), base, np.uint8)
        grip = np.full((self.grip_hw, self.grip_hw, 3), 255 - base, np.uint8)
        return {"rgb_obs": {"rgb_static": img, "rgb_gripper": grip},
                "robot_obs": self._state.copy()}

    def step(self, action: np.ndarray):
        if self.host_latency_ms > 0:
            import time
            time.sleep(self.host_latency_ms / 1e3)
        action = np.asarray(action, np.float32)
        self._state[:6] += 0.02 * action[:6]
        self._state[6] = action[6]
        self._progress += float(np.abs(action[:6]).mean())
        return self.get_obs(), 0.0, False, self.get_info()

    def get_info(self) -> Dict:
        return {"progress": self._progress, "state": self._state.copy()}


class DebugTaskOracle:
    """Deterministic success oracle for DebugEnv: a subtask succeeds once
    enough motion has accumulated since the start of the rollout."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold

    def get_task_info_for_set(self, start_info: Dict, current_info: Dict,
                              subtasks: set) -> set:
        if current_info["progress"] - start_info["progress"] >= self.threshold:
            return set(subtasks)
        return set()


# ---------------------------------------------------------------------------
# policy adapter: obs dict -> device arrays -> DeerPolicy.step
# ---------------------------------------------------------------------------


class CalvinPolicyAdapter:
    """ModelWrapper equivalent (eval_utils.py:187-490): per-step preprocessing
    and text caching around a DeerPolicy.  Observation frames go to device
    raw-uint8; resize/normalize runs on device inside the jitted prefix."""

    def __init__(self, policy: DeerPolicy, text_fn: Callable,
                 text_len: int = 32, tcp_rel: bool = False):
        import functools
        from collections import deque
        self.policy = policy
        self.text_fn = text_fn
        self.text_len = text_len
        self.tcp_rel = tcp_rel
        self._goal_cache: Tuple[Optional[str], Optional[tuple]] = (None, None)
        self.llm_time = 0.0
        size = policy.cfg.vit.image_size
        # jit: eager resize/normalize would dispatch per-op (fatal over a
        # tunneled TPU); one compiled program per camera instead
        self._prep = jax.jit(functools.partial(clip_preprocess, size=size))
        gsize = policy.cfg.gripper_res or size
        # native-res gripper tower (cfg.gripper_res): the wrist camera preps
        # to its own (smaller) size — at CALVIN's native 84 the resize is a
        # no-op and the host->device frame shrinks (84/224)^2 ~ 7x
        self._prep_grip = (self._prep if gsize == size else
                           jax.jit(functools.partial(clip_preprocess,
                                                     size=gsize)))
        # vit_concat / use_hist serving: rolling window of the last W
        # frames, fed to the engine as W batch rows per step (the
        # reference's img_queue protocol, eval_utils.py:344-386; left-padded
        # with the episode's first frame).  use_hist additionally tiles the
        # goal text per frame (the pad_length text_queue, :366-378).
        # The default protocol re-encodes all W frames per step (like the
        # reference's uncached path); wrap the policy in
        # eval/caching.FrameCachePolicy (--frame_cache) for the rolling
        # device-side token queue that encodes only the newest frame
        # (feature_cache analogue, eval_utils.py:371) — exact actions,
        # (W-1)/W less vision work.
        cfg0 = policy.cfg
        self._window = (cfg0.window_size
                        if (cfg0.fusion_mode == "vit_concat"
                            or cfg0.use_hist) else 0)
        self._tile_text = cfg0.use_hist
        # frame-cache policies (eval/caching.FrameCachePolicy) hold the
        # token window on DEVICE: feed only the newest frame, keep the
        # per-frame state queue and use_hist text tiling
        self._img_window = (0 if getattr(policy, "feeds_single_frame", False)
                            else self._window)
        if self._img_window:
            # one program for both cameras' window stacking (an eager
            # per-step jnp.concatenate would be a tunnel round trip each)
            self._win_cat = jax.jit(
                lambda fs, gs: (jnp.concatenate(fs, axis=0),
                                jnp.concatenate(gs, axis=0)))
        self._img_q = deque(maxlen=self._window or 1)
        self._grip_q = deque(maxlen=self._window or 1)
        # state rides the same rolling window for window-folded state models
        # (the reference's state_queue, eval_utils.py:245-249,384-385)
        self._state_q = deque(maxlen=self._window or 1)

    def reset(self):
        self.policy.reset()
        self._img_q.clear()
        self._grip_q.clear()
        self._state_q.clear()

    @property
    def current_exit_layer(self) -> int:
        return self.policy.last_exit_layer

    def _tokenize(self, goal: str):
        cached_goal, cached = self._goal_cache
        if cached_goal == goal:
            return cached
        from deer_vla_tpu.data.text import fixed_length
        ids, mask = self.text_fn([goal])
        pad_id = getattr(self.text_fn, "pad_token_id", 0)
        ids, mask = fixed_length(ids, mask, self.text_len, pad_id)
        if self._window and self._tile_text:
            # use_hist: text per frame row — tiled on HOST and cached per
            # goal (a per-step device tile would be an eager tunnel dispatch)
            ids = np.tile(np.asarray(ids), (self._window, 1))
            mask = np.tile(np.asarray(mask), (self._window, 1))
        out = (jnp.asarray(ids), jnp.asarray(mask))
        self._goal_cache = (goal, out)
        return out

    def step(self, obs: Dict, goal: str) -> np.ndarray:
        import time
        img = self._prep(jnp.asarray(obs["rgb_obs"]["rgb_static"])[None])
        grip = self._prep_grip(jnp.asarray(obs["rgb_obs"]["rgb_gripper"])[None])
        img = img[:, None, None]   # (1, 1, 1, 3, 224, 224)
        grip = grip[:, None, None]
        if self._img_window:
            # rolling W-frame window (left-padded with the first frame at
            # episode start, eval_utils.py:344-349); the engine folds the
            # window into the media tokens
            if not self._img_q:
                for _ in range(self._window):
                    self._img_q.append(img)
                    self._grip_q.append(grip)
            else:
                self._img_q.append(img)
                self._grip_q.append(grip)
            img, grip = self._win_cat(list(self._img_q),
                                      list(self._grip_q))
        ids, mask = self._tokenize(goal)
        state = None
        cfg = self.policy.cfg
        if (cfg.use_state or cfg.head.use_state) and "robot_obs" in obs:
            # proprio for state-trained models: state_fc vision token +
            # head embed_state (same (1,1,1,state_dim) layout as training)
            ro = np.asarray(obs["robot_obs"], np.float32)
            if cfg.clip_state:
                ro = np.concatenate([ro[:6], ro[-1:]], -1)
            state_row = ro[None, None, None, :]
            if self._window:
                # per-frame state rows matching the frame window
                if not self._state_q:
                    for _ in range(self._window):
                        self._state_q.append(state_row)
                else:
                    self._state_q.append(state_row)
                state = jnp.asarray(np.concatenate(list(self._state_q), 0))
            else:
                state = jnp.asarray(state_row)
        t0 = time.perf_counter()
        if state is not None:  # jit engines (k=1, stateless) keep 4-arg step
            action = self.policy.step(img, grip, ids, mask, state=state)
        else:
            action = self.policy.step(img, grip, ids, mask)
        self.llm_time = time.perf_counter() - t0
        if self.tcp_rel and "robot_obs" in obs:
            # tcp-frame-trained policy: convert the predicted action(s) back
            # to the world frame with the CURRENT tcp pose.  The reference
            # declares this path but leaves it NotImplementedError
            # (eval_utils.py:482-487); here it works, including (k, 7) plans.
            if not hasattr(self, "_tcp2world"):
                from deer_vla_tpu.utils.tcp import tcp_to_world_frame
                self._tcp2world = jax.jit(tcp_to_world_frame)
            ro = np.asarray(obs["robot_obs"], np.float32)
            a = np.asarray(action, np.float32)
            ro_b = np.ascontiguousarray(np.broadcast_to(
                ro, a.shape[:-1] + (ro.shape[-1],)))
            action = np.asarray(self._tcp2world(jnp.asarray(a),
                                                jnp.asarray(ro_b)),
                                np.float32)
        return action


# ---------------------------------------------------------------------------
# rollout loops (eval_utils.py:583-687)
# ---------------------------------------------------------------------------


def rollout(env, adapter: CalvinPolicyAdapter, task_oracle, subtask: str,
            lang_annotation: str, ep_len: int = EP_LEN,
            replan: int = -1,
            viz_path: Optional[str] = None
            ) -> Tuple[bool, List[int], int, List[float]]:
    """One subtask episode (eval_utils.py:625-687).  The policy may return a
    single (7,) action or a (k, 7) plan (multi_step_action/multi_execution);
    planned actions are consumed one per env step without re-running the
    policy (planned_actions queue, eval_utils.py:668-675).

    viz_path: save the episode's static-camera frames as
    ``{viz_path}_{ok|fail}.gif`` (the reference's --visualize collects an
    img_queue it never writes, eval_utils.py:649-678 — this one saves)."""
    obs = env.get_obs()
    adapter.reset()
    start_info = env.get_info()
    exit_layers, llm_times = [], []
    frames = [obs["rgb_obs"]["rgb_static"].copy()] if viz_path else None
    planned: List[np.ndarray] = []

    def save_gif(ok: bool):
        from PIL import Image
        ims = [Image.fromarray(f) for f in frames]
        path = f"{viz_path}_{'ok' if ok else 'fail'}.gif"
        ims[0].save(path, save_all=True, append_images=ims[1:],
                    duration=50, loop=0)

    for step in range(ep_len):
        if replan != -1 and step % replan == 0:
            adapter.reset()
            planned.clear()
        adapter.policy.set_timestep(step)
        if not planned:
            action = adapter.step(obs, lang_annotation)
            if action.ndim == 2:
                planned.extend(list(action))
            else:
                planned.append(action)
        # metrics recorded once PER ENV STEP, incl. queued-plan steps
        # (eval_utils.py:664-666), so multi_execution histograms stay
        # comparable to the reference's accounting
        exit_layers.append(adapter.current_exit_layer)
        llm_times.append(adapter.llm_time)
        obs, _, _, current_info = env.step(planned.pop(0))
        if frames is not None:
            frames.append(obs["rgb_obs"]["rgb_static"].copy())
        if task_oracle.get_task_info_for_set(start_info, current_info, {subtask}):
            if frames is not None:
                save_gif(True)
            return True, exit_layers, step + 1, llm_times
    if frames is not None:
        save_gif(False)
    return False, exit_layers, ep_len, llm_times


def reset_env_to_initial_state(env, initial_state) -> None:
    """Apply a chain's initial state (eval_utils.py:587-589).

    eval_sequences.json entries are SYMBOLIC condition dicts (led/drawer/
    slider/...); CALVIN converts them with
    get_env_state_for_initial_condition before env.reset(robot_obs,
    scene_obs).  Falls back to a raw robot_obs/scene_obs dict or a plain
    reset when calvin_agent is unavailable (DebugEnv)."""
    robot_obs = scene_obs = None
    if isinstance(initial_state, dict) and initial_state:
        if "robot_obs" in initial_state or "scene_obs" in initial_state:
            robot_obs = initial_state.get("robot_obs")
            scene_obs = initial_state.get("scene_obs")
        else:
            try:
                from calvin_agent.evaluation.utils import \
                    get_env_state_for_initial_condition
                robot_obs, scene_obs = get_env_state_for_initial_condition(
                    initial_state)
            except Exception:
                pass  # symbolic dict without calvin installed (DebugEnv)
    try:
        env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
    except TypeError:
        env.reset(robot_obs=robot_obs)


def resolve_annotation(annotations, subtask: str, seq_i: int = 0,
                       subtask_i: int = 0) -> str:
    """Dict {task: text} (standard) or list-of-lists [seq][subtask]
    (enriched lang_annotation_cache.json for --diverse_inst,
    eval_utils.py:513-516,538-541)."""
    if isinstance(annotations, list):
        return annotations[seq_i][subtask_i]
    return annotations.get(subtask, subtask)


def evaluate_sequence(env, adapter, task_oracle, initial_state, eval_sequence,
                      annotations, ep_len: int = EP_LEN, seq_i: int = 0,
                      replan: int = -1, reset: bool = False,
                      visualize_dir: Optional[str] = None):
    """One 5-subtask chain; stops at the first failure (eval_utils.py:583-622).

    reset=True re-resets the env to the chain's initial state before EVERY
    subtask (the reference's --reset eval mode, eval_utils.py:603-606 —
    each subtask starts from the frozen scene instead of wherever the
    previous one left it)."""
    reset_env_to_initial_state(env, initial_state)
    success_counter = 0
    s_exits, f_exits, s_steps, s_times = [], [], [], []
    for subtask_i, subtask in enumerate(eval_sequence):
        if reset and subtask_i > 0:
            reset_env_to_initial_state(env, initial_state)
        lang = resolve_annotation(annotations, subtask, seq_i, subtask_i)
        viz = (os.path.join(visualize_dir,
                            f"seq{seq_i:04d}_{subtask_i}_{subtask}")
               if visualize_dir else None)
        ok, exits, n_steps, times = rollout(env, adapter, task_oracle, subtask,
                                            lang, ep_len, replan,
                                            viz_path=viz)
        if ok:
            success_counter += 1
            s_exits.extend(exits)
            s_steps.append(n_steps)
            s_times.extend(times)
        else:
            f_exits.extend(exits)
            break
    return success_counter, s_exits, f_exits, s_steps, s_times


def evaluate_policy(adapter: CalvinPolicyAdapter, env, sequences: List,
                    annotations, task_oracle,
                    *, rank: int = 0, world_size: int = 1,
                    num_sequences: Optional[int] = None,
                    ep_len: int = EP_LEN,
                    flops_per_layer: Optional[float] = None,
                    n_layers: Optional[int] = None,
                    replan: int = -1, reset: bool = False,
                    visualize_dir: Optional[str] = None) -> Dict:
    """Statically shard sequences over processes (eval_utils.py:521-527),
    run chains, gather every rank's raw results, and summarize GLOBALLY —
    the reference's gather_object-to-rank-0 merge (eval_utils.py:565-577).
    With world_size == 1 the gather is an identity; under
    jax.distributed.initialize every rank returns the SAME merged report
    (rank-0 filtering is the caller's choice).  Certified across a real OS
    process boundary by scripts/dryrun_2proc.py (eval/2proc)."""
    n = num_sequences or len(sequences)
    assert n % world_size == 0, "NUM_SEQUENCES % device_num == 0 (eval_utils.py:525)"
    per = n // world_size
    my = sequences[rank * per:(rank + 1) * per]
    if visualize_dir:
        os.makedirs(visualize_dir, exist_ok=True)

    results, s_exits, f_exits, steps, s_times = [], [], [], [], []
    for local_i, (initial_state, eval_sequence) in enumerate(my):
        r, se, fe, st, ti = evaluate_sequence(
            env, adapter, task_oracle, initial_state, eval_sequence,
            annotations, ep_len, seq_i=rank * per + local_i, replan=replan,
            reset=reset, visualize_dir=visualize_dir)
        results.append(r)
        s_exits.extend(se)
        f_exits.extend(fe)
        steps.extend(st)
        s_times.extend(ti)

    # raw-tuple gather + rank-ordered merge: per-rank results concatenated
    # in rank order line up with the contiguous sequence shards, so the
    # per-task table zips merged results against sequences[:n] exactly as
    # a single-process run over all n would
    from deer_vla_tpu.parallel.multihost import gather_objects
    gathered = gather_objects({
        "rank": rank, "results": results, "s_exits": s_exits,
        "f_exits": f_exits, "steps": steps, "s_times": s_times})
    gathered.sort(key=lambda p: p["rank"])
    results = [r for p in gathered for r in p["results"]]
    s_exits = [e for p in gathered for e in p["s_exits"]]
    f_exits = [e for p in gathered for e in p["f_exits"]]
    steps = [s for p in gathered for s in p["steps"]]
    s_times = [t for p in gathered for t in p["s_times"]]
    nl = n_layers or adapter.policy.cfg.n_layers
    return summarize(results, s_exits, f_exits, steps, s_times,
                     sequences[:n], nl, flops_per_layer)


def load_eval_sequences(path: str) -> List:
    """Frozen 1000-chain list (eval_sequences.json, eval_utils.py:521-522)."""
    with open(path) as f:
        return json.load(f)


def make_debug_sequences(n: int = 8, seed: int = 0) -> List:
    from deer_vla_tpu.data.debug_data import TASKS
    r = np.random.RandomState(seed)
    seqs = []
    for _ in range(n):
        chain = [TASKS[r.randint(len(TASKS))] for _ in range(5)]
        seqs.append(({}, chain))
    return seqs
