"""Batched rollout evaluation: N CALVIN chains advance in lockstep through
ONE batched policy program per env step.

The reference parallelizes eval across GPUs only (one env per rank,
eval_utils.py:521-527; 1000 sequences ~ 4-5 h on 8x V100).  Here B env
streams share a single chip via ScanDeerPolicy.step_batch (per-stream
dynamic exits, one dispatch per step); finished streams immediately pull the
next pending chain (dynamic dispatch), so the chip stays busy until the
queue drains.

Envs remain host-side objects (one per stream — the CALVIN simulator is a
CPU program); only the policy is batched.  Semantics per stream are
identical to the sequential harness: per-subtask policy reset, first-failure
chain termination, 360-step cap.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.data.text import fixed_length
from deer_vla_tpu.eval.metrics import summarize
from deer_vla_tpu.eval.rollout import EP_LEN, resolve_annotation


class _Stream:
    """Host bookkeeping for one rollout lane."""

    def __init__(self, idx: int):
        self.idx = idx
        self.seq_i: Optional[int] = None   # global sequence index
        self.chain: List[str] = []
        self.subtask_i = 0
        self.step = 0
        self.successes = 0
        self.exit_layers: List[int] = []
        self.start_info: Optional[Dict] = None
        self.active = False


def evaluate_policy_batched(policy, envs: List, sequences: List,
                            annotations, task_oracle, text_fn,
                            *, text_len: int = 32, ep_len: int = EP_LEN,
                            preprocess: Optional[Callable] = None,
                            n_layers: Optional[int] = None) -> Dict:
    """Run all ``sequences`` over ``len(envs)`` parallel streams.

    policy: ScanDeerPolicy (step_batch/reset_streams).
    envs:   B independent env instances (DebugEnv or CALVIN wrappers).
    preprocess: uint8 HWC frame -> (3, H, W) device-ready array; defaults to
                clip_preprocess at the policy's image size.
    """
    import jax
    from deer_vla_tpu.data.preprocess import clip_preprocess

    b = len(envs)
    size = policy.cfg.vit.image_size
    if preprocess is None:
        prep = jax.jit(lambda x: clip_preprocess(x, size))
    else:
        prep = preprocess

    streams = [_Stream(i) for i in range(b)]
    pending = list(range(len(sequences)))
    results: Dict[int, int] = {}
    s_exits: List[int] = []
    f_exits: List[int] = []
    s_steps: List[int] = []
    pad_id = getattr(text_fn, "pad_token_id", 0)

    def assign(stream: _Stream) -> bool:
        if not pending:
            stream.active = False
            return False
        stream.seq_i = pending.pop(0)
        initial_state, chain = sequences[stream.seq_i]
        stream.chain = list(chain)
        stream.subtask_i = 0
        stream.successes = 0
        from deer_vla_tpu.eval.rollout import reset_env_to_initial_state
        reset_env_to_initial_state(envs[stream.idx], initial_state)
        _begin_subtask(stream)
        stream.active = True
        return True

    def _begin_subtask(stream: _Stream):
        stream.step = 0
        stream.exit_layers = []
        stream.start_info = envs[stream.idx].get_info()
        policy.reset_streams(np.arange(b) == stream.idx)

    def _finish_sequence(stream: _Stream):
        results[stream.seq_i] = stream.successes
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

    while any(st.active for st in streams):
        imgs, grips, idss, masks = [], [], [], []
        for st in streams:
            if st.active:
                obs = envs[st.idx].get_obs()
                imgs.append(obs["rgb_obs"]["rgb_static"])
                grips.append(obs["rgb_obs"]["rgb_gripper"])
            else:  # parked lane: feed zeros
                hw_s = envs[st.idx].get_obs()["rgb_obs"]["rgb_static"].shape
                imgs.append(np.zeros(hw_s, np.uint8))
                grips.append(np.zeros(
                    envs[st.idx].get_obs()["rgb_obs"]["rgb_gripper"].shape,
                    np.uint8))
            ids, mask = tokens_for(st) if st.active else (
                np.zeros(text_len, np.int32), np.zeros(text_len, np.int32))
            idss.append(ids)
            masks.append(mask)

        img_d = prep(jnp.asarray(np.stack(imgs)))[:, None, None]
        grip_d = prep(jnp.asarray(np.stack(grips)))[:, None, None]
        actions, exit_layers = policy.step_batch(
            img_d, grip_d, jnp.asarray(np.stack(idss)),
            jnp.asarray(np.stack(masks)))
        # multi_step_action k>1: step_batch returns (B, k, 7) plans; every
        # active stream executes its k planned actions before the next
        # dispatch (plans stay phase-aligned across streams).  A stream that
        # finishes its subtask mid-plan drops the plan remainder and idles
        # until the cursor wraps (the reference queues plans per stream,
        # eval_utils.py:668-675; lockstep batching makes the drop the
        # semantically safe choice after a policy reset).
        plans = actions if actions.ndim == 3 else actions[:, None, :]
        valid = [st.active for st in streams]

        for j in range(plans.shape[1]):
            for st in streams:
                if not st.active or not valid[st.idx]:
                    continue
                if j == 0:
                    st.exit_layers.append(int(exit_layers[st.idx]))
                obs, _, _, info = envs[st.idx].step(plans[st.idx, j])
                st.step += 1
                subtask = st.chain[st.subtask_i]
                done = bool(task_oracle.get_task_info_for_set(
                    st.start_info, info, {subtask}))
                if done:
                    st.successes += 1
                    s_exits.extend(st.exit_layers)
                    s_steps.append(st.step)
                    st.subtask_i += 1
                    if st.subtask_i >= len(st.chain):
                        _finish_sequence(st)
                    else:
                        _begin_subtask(st)
                    valid[st.idx] = False
                elif st.step >= ep_len:
                    f_exits.extend(st.exit_layers)
                    _finish_sequence(st)
                    valid[st.idx] = False

    ordered = [results[i] for i in sorted(results)]
    nl = n_layers or policy.cfg.n_layers
    return summarize(ordered, s_exits, f_exits, s_steps, [],
                     [sequences[i] for i in sorted(results)], nl)
