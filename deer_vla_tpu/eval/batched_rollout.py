"""Batched rollout evaluation: N CALVIN chains advance in lockstep through
ONE batched policy program per env step.

The reference parallelizes eval across GPUs only (one env per rank,
eval_utils.py:521-527; 1000 sequences ~ 4-5 h on 8x V100).  Here B env
streams share a single chip via ScanDeerPolicy.step_batch (per-stream
dynamic exits, one dispatch per step); finished streams immediately pull the
next pending chain (dynamic dispatch), so the chip stays busy until the
queue drains.

``pipeline`` > 1 additionally splits the lanes into that many groups and
overlaps HOST work (env.step, obs gather, tokenization) of one group with
the DEVICE program of the others: group g's actions are fetched
(finish_batch) while group g+1's program runs, using the async half of
ScanDeerPolicy.dispatch_batch.  On a device whose dispatch/readback latency
rivals compute (tunneled TPUs; or CPU-heavy simulators) this hides most of
the host time; semantics per stream are IDENTICAL to pipeline=1 because
lane groups touch disjoint envs and carries.

Envs remain host-side objects (one per stream — the CALVIN simulator is a
CPU program); only the policy is batched.  Semantics per stream are
identical to the sequential harness: per-subtask policy reset, first-failure
chain termination, 360-step cap.

Window-folded models (vit_concat / use_hist) batch too: each lane keeps a
rolling W-frame window (the single-stream adapter's img_queue, reference
eval_utils.py:344-386) fed to the engine as W stream-major frame rows, with
use_hist goal text tiled per frame.  Proprio models (--use_state) thread
per-lane robot_obs rows through the batched program (one row per frame for
folded modes — the adapter's state_queue).
"""

from __future__ import annotations

import copy
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.data.text import fixed_length
from deer_vla_tpu.eval.metrics import summarize
from deer_vla_tpu.eval.rollout import EP_LEN, resolve_annotation


class _Stream:
    """Host bookkeeping for one rollout lane."""

    def __init__(self, idx: int, group: int, local: int):
        self.idx = idx        # global lane index (env index)
        self.group = group    # pipeline group
        self.local = local    # index within the group's policy batch
        self.seq_i: Optional[int] = None   # global sequence index
        self.chain: List[str] = []
        self.subtask_i = 0
        self.step = 0
        self.successes = 0
        self.exit_layers: List[int] = []
        self.last_exit = -1   # per-stream stage reuse (steps_per_stage)
        self.start_info: Optional[Dict] = None
        self.initial_state = None  # chain's frozen scene (reset mode)
        self.active = False
        # window-folded serving (vit_concat / use_hist): per-lane rolling
        # frame window, the batched analogue of CalvinPolicyAdapter's
        # img_queue (eval/rollout.py; reference eval_utils.py:344-386).
        # Raw uint8 frames; the whole group's window stack preprocesses in
        # ONE jitted call per dispatch.
        self.img_q: List[np.ndarray] = []
        self.grip_q: List[np.ndarray] = []
        self.state_q: List[np.ndarray] = []


def evaluate_policy_batched(policy, envs: List, sequences: List,
                            annotations, task_oracle, text_fn,
                            *, text_len: int = 32, ep_len: int = EP_LEN,
                            preprocess: Optional[Callable] = None,
                            n_layers: Optional[int] = None,
                            pipeline: int = 1,
                            candidates: Optional[List] = None,
                            reset: bool = False,
                            env_workers: int = 0):
    """Run all ``sequences`` over ``len(envs)`` parallel streams.

    policy: ScanDeerPolicy (step_batch/reset_streams; dispatch_batch/
            finish_batch for pipeline>1).
    envs:   B independent env instances (DebugEnv or CALVIN wrappers).
    preprocess: uint8 HWC frame -> (3, H, W) device-ready array; defaults to
                clip_preprocess at the policy's image size.
    pipeline: number of lane groups whose host work overlaps the other
              groups' device programs (1 = fully sequential harness).
    candidates: parallel multi-candidate mode (the parallel-BO substrate):
              a list of K per-exit threshold rows.  Lanes split into K
              contiguous blocks; block k's streams run candidates[k]'s
              thresholds via the engine's (B, n_layers) runtime threshold
              array, and EVERY candidate evaluates ALL ``sequences``.
              Returns a list of K reports instead of one (the reference
              evaluates BO candidates as serial full eval runs,
              bayesian_optimization.py:130-144).
    env_workers: >1 steps a group's envs through a thread pool (the CALVIN
              simulator — pybullet physics + EGL render — releases the GIL,
              so N simulator steps run on N host cores).  Semantics are
              identical to serial: envs are independent objects, per-lane
              step order is preserved, and all shared bookkeeping (pending
              queue, results, policy carries) stays on the drive thread.
    """
    import jax
    from deer_vla_tpu.data.preprocess import clip_preprocess

    b = len(envs)
    cfg = policy.cfg
    size = cfg.vit.image_size
    if preprocess is None:
        prep = jax.jit(lambda x: clip_preprocess(x, size))
        gsize = cfg.gripper_res or size
        # native-res gripper (cfg.gripper_res): wrist frames prep to their
        # own size; a caller-supplied preprocess is used for both cameras
        prep_grip = (prep if gsize == size
                     else jax.jit(lambda x: clip_preprocess(x, gsize)))
    else:
        prep = preprocess
        prep_grip = preprocess
    # window-folded models (vit_concat / use_hist): each lane feeds its
    # rolling W-frame window as W stream-major batch rows (the engine folds
    # the window into the media tokens exactly as the single-stream windowed
    # adapter does); use_hist additionally tiles the goal text per frame
    folded_w = (cfg.window_size
                if (cfg.fusion_mode == "vit_concat" or cfg.use_hist) else 0)
    tile_text = cfg.use_hist
    # proprio (--use_state): per-lane robot_obs rows — silently serving a
    # state-trained model without its state token would be a train/serve
    # mismatch (the state_fc concat is skipped when state is None)
    use_state = cfg.use_state or cfg.head.use_state
    state_dim = None

    pool = None
    if env_workers and env_workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=env_workers,
                                  thread_name_prefix="deer-env")

    n_cand = len(candidates) if candidates else 1
    if candidates:
        if b % n_cand:
            raise ValueError(f"{b} lanes not divisible by {n_cand} "
                             "candidates")

    def cand_of(lane: int) -> int:
        return lane * n_cand // b

    n_groups = max(1, min(pipeline, b))
    # equal group sizes keep every group on ONE compiled batch shape (the
    # while-loop engine compiles ~90 s at 3B over the tunnel); round the
    # requested pipeline down to the nearest divisor of the lane count
    while b % n_groups:
        n_groups -= 1
    lanes = [list(range(g, b, n_groups)) for g in range(n_groups)]
    # group policies share the compiled step/params/thresholds (shallow
    # copy) but hold independent carries sized to their lane count
    gpol = [policy] + [copy.copy(policy) for _ in range(n_groups - 1)]
    for p in gpol:
        p.reset()
    if candidates:
        for g, p in enumerate(gpol):
            p.set_thresholds_batch([candidates[cand_of(i)]
                                    for i in lanes[g]])

    streams: List[_Stream] = [None] * b  # type: ignore[list-item]
    for g, ls in enumerate(lanes):
        for local, idx in enumerate(ls):
            streams[idx] = _Stream(idx, g, local)
    pending = [list(range(len(sequences))) for _ in range(n_cand)]
    results: List[Dict[int, int]] = [{} for _ in range(n_cand)]
    s_exits: List[List[int]] = [[] for _ in range(n_cand)]
    f_exits: List[List[int]] = [[] for _ in range(n_cand)]
    s_steps: List[List[int]] = [[] for _ in range(n_cand)]
    pad_id = getattr(text_fn, "pad_token_id", 0)

    def assign(stream: _Stream) -> bool:
        q = pending[cand_of(stream.idx)]
        if not q:
            stream.active = False
            return False
        stream.seq_i = q.pop(0)
        initial_state, chain = sequences[stream.seq_i]
        stream.chain = list(chain)
        stream.subtask_i = 0
        stream.successes = 0
        stream.initial_state = initial_state
        from deer_vla_tpu.eval.rollout import reset_env_to_initial_state
        reset_env_to_initial_state(envs[stream.idx], initial_state)
        _begin_subtask(stream)
        stream.active = True
        return True

    def _begin_subtask(stream: _Stream):
        stream.step = 0
        stream.exit_layers = []
        stream.last_exit = -1
        stream.img_q = []   # fresh frame window per subtask (adapter.reset)
        stream.grip_q = []
        stream.state_q = []
        stream.start_info = envs[stream.idx].get_info()
        gb = len(lanes[stream.group])
        gpol[stream.group].reset_streams(np.arange(gb) == stream.local)

    def _finish_sequence(stream: _Stream):
        results[cand_of(stream.idx)][stream.seq_i] = stream.successes
        assign(stream)

    for st in streams:
        assign(st)

    # token cache per distinct instruction
    tok_cache: Dict[str, np.ndarray] = {}

    def tokens_for(stream: _Stream):
        lang = resolve_annotation(annotations, stream.chain[stream.subtask_i],
                                  stream.seq_i, stream.subtask_i)
        if lang not in tok_cache:
            ids, mask = text_fn([lang])
            ids, mask = fixed_length(ids, mask, text_len, pad_id)
            tok_cache[lang] = (ids[0], mask[0])
        return tok_cache[lang]

    def group_active(g: int) -> bool:
        return any(streams[i].active for i in lanes[g])

    # per-stream stage reuse (--steps_per_stage, value_net.py:284-286):
    # mid-stage streams force their previous exit layer through the
    # (B, n_layers) runtime threshold rows, rebuilt on host per dispatch
    # from the pristine per-group base (shared or candidate thresholds)
    sps = int(getattr(policy, "steps_per_stage", 1) or 1)
    nl_full = policy.cfg.n_layers
    base_rows = []
    for g in range(n_groups):
        base = np.asarray(gpol[g].thresholds, np.float32)
        base_rows.append(np.tile(base, (len(lanes[g]), 1))
                         if base.ndim == 1 else base.copy())
    # a parked lane (queue drained) must exit at the FIRST exit layer so it
    # never prolongs the batch's while_loop (the batcher's _park_row rule);
    # its action is discarded anyway
    park_row = policy.threshold_row(
        {e: (1e30 if e == policy.exits[0] else -1e30)
         for e in policy.exits})
    rows_dirty = [False] * n_groups

    def _dispatch_rows(g: int) -> Optional[np.ndarray]:
        """Per-lane threshold rows for this dispatch, or None when the
        group's pristine base rows already apply (all lanes active, no
        mid-stage force) and the engine still holds them."""
        rows = None
        for local, i in enumerate(lanes[g]):
            st = streams[i]
            if not st.active:
                rows = base_rows[g].copy() if rows is None else rows
                rows[local] = park_row
            elif sps > 1 and st.step % sps != 0 and st.last_exit >= 0:
                rows = base_rows[g].copy() if rows is None else rows
                rows[local] = np.full(nl_full, -1e30, np.float32)
                rows[local, st.last_exit] = 1e30
        if rows is None and rows_dirty[g]:
            rows = base_rows[g].copy()  # restore pristine thresholds
        return rows

    # batched-exit waste accounting (the while_loop runs the whole batch to
    # the SLOWEST stream's exit, scan_policy.step docstring): per dispatch,
    # each active stream wastes (batch_max_exit - own_exit) layers
    waste = {"dispatches": 0, "max_sum": 0, "waste_sum": 0.0,
             "active_steps": 0, "exit_sum": 0}

    def _state_row(obs) -> np.ndarray:
        """robot_obs -> the training state layout (CalvinPolicyAdapter)."""
        ro = np.asarray(obs["robot_obs"], np.float32)
        if cfg.clip_state:
            ro = np.concatenate([ro[:6], ro[-1:]], -1)
        return ro

    def dispatch(g: int):
        rows = _dispatch_rows(g)
        if rows is not None:
            gpol[g].set_threshold_array(rows)
            rows_dirty[g] = not np.array_equal(rows, base_rows[g])
        imgs, grips, idss, masks, states = [], [], [], [], []
        rep = folded_w or 1  # frame rows per lane (stream-major)
        for i in lanes[g]:
            st = streams[i]
            obs = envs[st.idx].get_obs()
            if st.active:
                f = obs["rgb_obs"]["rgb_static"]
                gr = obs["rgb_obs"]["rgb_gripper"]
                sr = _state_row(obs) if use_state else None
                if folded_w:
                    # rolling W-frame window, left-padded with the
                    # subtask's first frame (eval_utils.py:344-349)
                    if not st.img_q:
                        st.img_q = [f] * folded_w
                        st.grip_q = [gr] * folded_w
                        st.state_q = [sr] * folded_w if use_state else []
                    else:
                        st.img_q = (st.img_q + [f])[-folded_w:]
                        st.grip_q = (st.grip_q + [gr])[-folded_w:]
                        if use_state:
                            st.state_q = (st.state_q + [sr])[-folded_w:]
                    imgs.extend(st.img_q)
                    grips.extend(st.grip_q)
                    states.extend(st.state_q)
                else:
                    imgs.append(f)
                    grips.append(gr)
                    if use_state:
                        states.append(sr)
                ids, mask = tokens_for(st)
            else:  # parked lane: feed zeros
                z = np.zeros(obs["rgb_obs"]["rgb_static"].shape, np.uint8)
                zg = np.zeros(obs["rgb_obs"]["rgb_gripper"].shape, np.uint8)
                imgs.extend([z] * rep)
                grips.extend([zg] * rep)
                if use_state:
                    states.extend([np.zeros_like(_state_row(obs))] * rep)
                ids = np.zeros(text_len, np.int32)
                mask = np.zeros(text_len, np.int32)
            # use_hist: text rows are per-frame (the adapter tiles the goal
            # per window position, eval_utils.py:366-378)
            idss.extend([ids] * (rep if tile_text else 1))
            masks.extend([mask] * (rep if tile_text else 1))
        img_d = prep(jnp.asarray(np.stack(imgs)))[:, None, None]
        grip_d = prep_grip(jnp.asarray(np.stack(grips)))[:, None, None]
        args = (img_d, grip_d, jnp.asarray(np.stack(idss)),
                jnp.asarray(np.stack(masks)))
        if use_state:
            # (rows, 1, 1, D): the training layout, one row per frame
            st_d = jnp.asarray(np.stack(states)[:, None, None, :])
            args = args + (st_d,)
        if n_groups > 1 and hasattr(gpol[g], "dispatch_batch"):
            return ("async", gpol[g].dispatch_batch(*args))
        return ("sync", gpol[g].step_batch(*args))

    def finish(g: int, handle):
        kind, payload = handle
        if kind == "async":
            return gpol[g].finish_batch(payload)
        return payload

    def apply(g: int, actions: np.ndarray, exit_layers: np.ndarray):
        """Execute one policy output for group g: k env steps per stream for
        (Bg, k, 7) plans; success/timeout bookkeeping identical to the
        sequential harness.  A stream that finishes its subtask mid-plan
        drops the plan remainder and idles until the next dispatch (the
        reference queues plans per stream, eval_utils.py:668-675; lockstep
        batching makes the drop the semantically safe choice after a policy
        reset)."""
        plans = actions if actions.ndim == 3 else actions[:, None, :]
        valid = {i: streams[i].active for i in lanes[g]}
        ex = np.asarray(exit_layers, int)
        act_locals = [local for local, i in enumerate(lanes[g])
                      if streams[i].active]
        if act_locals:
            bm = int(ex.max())  # the depth the device actually ran
            waste["dispatches"] += 1
            waste["max_sum"] += bm
            waste["exit_sum"] += int(sum(ex[l] for l in act_locals))
            waste["waste_sum"] += float(sum(bm - ex[l] for l in act_locals))
            waste["active_steps"] += len(act_locals)
        for j in range(plans.shape[1]):
            todo = [(local, i) for local, i in enumerate(lanes[g])
                    if streams[i].active and valid[i]]
            # env.step fan-out: independent simulator objects, same per-lane
            # order as serial; bookkeeping below stays on this thread
            if pool is not None and len(todo) > 1:
                outs = list(pool.map(
                    lambda t: envs[streams[t[1]].idx].step(plans[t[0], j]),
                    todo))
            else:
                outs = [envs[streams[i].idx].step(plans[local, j])
                        for local, i in todo]
            for (local, i), (obs, _, _, info) in zip(todo, outs):
                st = streams[i]
                if j == 0:
                    st.exit_layers.append(int(exit_layers[local]))
                    st.last_exit = int(exit_layers[local])
                st.step += 1
                subtask = st.chain[st.subtask_i]
                done = bool(task_oracle.get_task_info_for_set(
                    st.start_info, info, {subtask}))
                if done:
                    st.successes += 1
                    s_exits[cand_of(st.idx)].extend(st.exit_layers)
                    s_steps[cand_of(st.idx)].append(st.step)
                    st.subtask_i += 1
                    if st.subtask_i >= len(st.chain):
                        _finish_sequence(st)
                    else:
                        if reset:
                            # --reset: every subtask starts from the
                            # chain's frozen scene (eval_utils.py:603-606)
                            from deer_vla_tpu.eval.rollout import \
                                reset_env_to_initial_state
                            reset_env_to_initial_state(envs[st.idx],
                                                       st.initial_state)
                        _begin_subtask(st)
                    valid[i] = False
                elif st.step >= ep_len:
                    f_exits[cand_of(st.idx)].extend(st.exit_layers)
                    _finish_sequence(st)
                    valid[i] = False

    # pipelined drive loop: finishing group g's actions and stepping its
    # envs happens while the other groups' programs run on device
    try:
        handles: List = [None] * n_groups
        for g in range(n_groups):
            if group_active(g):
                handles[g] = dispatch(g)
        while any(h is not None for h in handles):
            for g in range(n_groups):
                if handles[g] is None:
                    continue
                acts, exits = finish(g, handles[g])
                handles[g] = None
                apply(g, acts, exits)
                if group_active(g):
                    handles[g] = dispatch(g)
    finally:
        if pool is not None:
            pool.shutdown(wait=True)

    nl = n_layers or policy.cfg.n_layers
    # realized batching waste (VERDICT r2 item 6): how much of the
    # early-exit FLOPs savings the lockstep batch forfeits by running every
    # stream to the dispatch's deepest exit
    waste_report = {}
    if waste["dispatches"]:
        d, a = waste["dispatches"], waste["active_steps"]
        waste_report = {
            "dispatches": d,
            "avg_batch_max_exit": round(waste["max_sum"] / d + 1, 3),
            "avg_exit_layer": round(waste["exit_sum"] / a + 1, 3),
            "avg_wasted_layers_per_step": round(waste["waste_sum"] / a, 3),
        }
    reports = []
    for c in range(n_cand):
        ordered = [results[c][i] for i in sorted(results[c])]
        rep = summarize(
            ordered, s_exits[c], f_exits[c], s_steps[c], [],
            [sequences[i] for i in sorted(results[c])], nl)
        if waste_report:
            rep["batched_exit_waste"] = waste_report
        reports.append(rep)
    return reports if candidates else reports[0]
