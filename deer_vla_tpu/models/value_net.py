"""Dynamic-exit control plane: action-consistency criterion, threshold
calibration, and the exit controller.

Port of robot_flamingo/models/value_net.py (ActionValueNet :72-160,
ExitController :163-297, generate_action_values :301-399), re-designed
functional:

  * the speculative head forward with an uncommitted LSTM carry
    (action_head tmp_hidden_state protocol) becomes "compute candidate carry,
    commit only on exit" — see eval/rollout.DynamicExitPolicy
  * the threshold solver is a pure numpy port of the sort/filter quantile
    matching (value_net.py:206-272)
  * calibration-mode delta generation is a single jit-able batch function.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deer_vla_tpu.core.config import DeerConfig
from deer_vla_tpu.models.action_head import head_forward


# ---------------------------------------------------------------------------
# action delta (value_net.py:105-117)
# ---------------------------------------------------------------------------


def get_delta(a1: jnp.ndarray, a2: jnp.ndarray, threshold_type: str = "L2") -> jnp.ndarray:
    """Distance between two (..., action_dim) arm actions, reduced over the
    last dim. Default 'L2' (eval_calvin.py:335)."""
    d = jnp.abs(a1 - a2)
    if threshold_type == "mean":
        return d.mean(-1)
    if threshold_type == "L2":
        return jnp.sqrt(jnp.square(d).mean(-1))
    if threshold_type == "max":
        return d.max(-1)
    if threshold_type == "cosine":
        f1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-5)
        f2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-5)
        return 1.0 - (f1 * f2).sum(-1)
    raise NotImplementedError(threshold_type)


# ---------------------------------------------------------------------------
# calibration: per-exit deltas over a batch (value_net.py:134-160 'generate')
# ---------------------------------------------------------------------------


def generate_exit_deltas(extra_exit_params: dict, hidden_states: jnp.ndarray,
                         rand_layer_feat: jnp.ndarray, cfg: DeerConfig,
                         exit_list: Sequence[int],
                         threshold_type: str = "L2",
                         warm_prefix: int = 0,
                         rng=None,
                         state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Faithful port of ActionValueNet 'generate' mode.

    Args:
      hidden_states: (L, B*W, S, D) all layer outputs for a batch
      rand_layer_feat: (B*W, S, D) random-exit features (sampling strategy 1)
      exit_list: the exit layer ids (0 must not be in it, value_net.py:135)
      warm_prefix: window-folded (w==1) models only — warm the head carry
        with this many pseudo-history frames drawn from OTHER trajectories'
        random-layer features before the evaluated position (needs ``rng``).
        Reduces the zero-carry calibration skew noted below; off by default
        (reference-faithful).
    Returns:
      deltas: (n_exit, B * n_seq_positions) where row k is the action gap
      between exit_list[k] and the previous entry of [0]+exit_list, evaluated
      at seq positions W//2-1 .. W-2 with random-layer history prefixes.
    """
    assert 0 not in exit_list
    # vit_concat folds the window into the media tokens: hidden batch is
    # per-trajectory, one action position, no history prefix.  CAVEAT: by
    # default this calibrates with a zero LSTM state, while serving streams
    # the carry across the episode — the delta distribution can be mildly
    # skewed for vit_concat models (post-mode calibration warms the carry
    # with random history prefixes; w=1 cannot).  ``warm_prefix`` (cli.eval
    # --calib_warm) applies the same decorrelated warm-up across batch rows;
    # online BO (cli/bayes_opt.py) is the reference-faithful corrective if
    # the exit mix matters.
    w = 1 if cfg.fusion_mode == "vit_concat" else cfg.window_size
    s, d = hidden_states.shape[2], hidden_states.shape[3]
    ids = [0] + list(exit_list)
    feats = [hidden_states[i].reshape(-1, w, s, d) for i in ids]  # (B, W, S, D) each
    rand = rand_layer_feat.reshape(-1, w, s, d)

    # proprio rows aligned with feats by timestep (the criterion head runs
    # with embed_state at serving — scan_policy/DeerPolicy pass state to the
    # speculative heads — so calibration must too); vit_concat trains the
    # head on the LAST frame's row (flamingo.py vit_concat branch)
    st = None
    if state is not None and cfg.head.use_state:
        st = state.reshape(-1, state.shape[-1])
        if w == 1 and st.shape[0] != rand.shape[0]:
            st = st.reshape(rand.shape[0], -1, st.shape[-1])[:, -1:]
        else:
            st = st.reshape(-1, w, st.shape[-1])  # (B, W, dim)

    warm = None
    warm_st = None
    if w == 1 and warm_prefix > 0:
        assert rng is not None, "warm_prefix needs an rng"
        b = rand.shape[0]
        # K independent batch permutations -> (B, K, S, D) pseudo-history of
        # same-distribution features from other trajectories (the post-mode
        # random-prior decorrelation idea, value_net.py:140-151)
        perms = jnp.stack([jax.random.permutation(jax.random.fold_in(rng, k),
                                                  b)
                           for k in range(warm_prefix)], axis=1)  # (B, K)
        warm = rand[:, 0][perms]  # (B, K, S, D)
        if st is not None:
            warm_st = st[:, 0][perms]  # (B, K, dim) — same permutations

    per_seq = []
    for seq_id in range(max(w // 2 - 1, 0), max(w - 1, 1)):
        prev = rand[:, :seq_id]  # (B, seq_id, S, D)
        st_win = None
        if st is not None:
            st_win = jnp.concatenate([st[:, :seq_id],
                                      st[:, seq_id:seq_id + 1]], axis=1)
            if warm_st is not None:
                st_win = jnp.concatenate([warm_st, st_win], axis=1)
            st_win = st_win.reshape(-1, st_win.shape[-1])
        if warm is not None:
            prev = jnp.concatenate([warm, prev], axis=1)
        acts = []
        for f in feats:
            last = f[:, seq_id:seq_id + 1]
            combined = jnp.concatenate([prev, last], axis=1)  # (B, seq_id+1, S, D)
            # routed by cfg.head_type; the diffusion head's "action" for the
            # exit criterion is its conditioning feature (models/heads.py)
            from deer_vla_tpu.models.heads import any_head_forward
            out = any_head_forward(
                extra_exit_params,
                combined.reshape(-1, s, d), cfg, st_win,
                window=combined.shape[1], last_action=True)
            if cfg.head_type == "diffusion":
                acts.append(out[:, 0])       # (B, hidden) feature
            else:
                acts.append(out.actions[:, 0])  # (B, 6)
        per_seq.append(jnp.stack(acts))  # (n_exit+1, B, 6)
    stacked = jnp.stack(per_seq, axis=2)  # (n_exit+1, B, n_seq, 6)
    delta = get_delta(stacked[1:], stacked[:-1], threshold_type)  # (n_exit, B, n_seq)
    return delta.reshape(delta.shape[0], -1)


def generate_streamed_exit_deltas(extra_exit_params: dict,
                                  hidden_states: jnp.ndarray,
                                  cfg: DeerConfig,
                                  exit_list: Sequence[int],
                                  threshold_type: str = "L2",
                                  rng=None,
                                  exit_sample_probs: Optional[
                                      Sequence[float]] = None,
                                  state: Optional[jnp.ndarray] = None,
                                  warm_rounds: int = 1
                                  ) -> jnp.ndarray:
    """Streamed-regime calibration deltas: the carry-matched alternative to
    ``generate_exit_deltas``.

    The folded generator scores window positions under RANDOM-layer history
    prefixes (the reference's decorrelation idea, value_net.py:140-151) with
    a fresh zero carry per position; serving instead threads ONE LSTM carry
    across the whole episode.  That regime mismatch shifts the delta
    quantiles, which is exactly the stable bias the streamed contract test
    measures (~0.16 peak-bin at tiny scale, tests/test_exit_contract.py).

    This variant reproduces the serving carry dynamics inside calibration:

      * per trajectory window, ONE carry threads timesteps t=0..W-1 (zero
        at t=0 — exactly a fresh episode);
      * at each t every entry of [0]+exit_list runs the streaming head from
        the SAME incoming carry (the engines' speculative-head contract,
        scan_policy.py:317-330) and consecutive entries' actions give the
        per-exit deltas;
      * the committed carry is the candidate from an exit SAMPLED from
        ``exit_sample_probs`` (default uniform; pass the target exit
        distribution so calibration carries follow the serving mix) — one
        draw per timestep, shared across the batch, mirroring that at
        serving the carry always comes from whichever exit fired;
      * ``warm_rounds`` extra passes over the window (committing sampled
        exits, collecting nothing) warm the carry BEYOND the window length
        before the scored pass — long served episodes (EP_LEN 360) run
        carries far warmer than one W-frame window can reach;
      * only positions t >= W//2 - 1 of the scored pass contribute deltas
        (the folded generator's lower bound).  DELIBERATE divergence from
        the folded range: the last position t = W-1 is INCLUDED here (the
        folded generator stops at W-2, mirroring value_net.py:140-151's
        position loop) — under streaming every timestep of a served episode
        is a real scoring position, so excluding the window's final step
        would discard a valid serving-regime sample for no reason.

    Returns (n_exit, B * n_positions) deltas.  Requires a real window
    (post/two_way modes); vit_concat folds the window into media tokens and
    has no stream to calibrate — use warm_prefix there.
    """
    from deer_vla_tpu.models.heads import any_head_step, any_zero_carry
    assert 0 not in exit_list
    if cfg.fusion_mode == "vit_concat" or cfg.window_size < 2:
        raise ValueError(
            "streamed calibration needs a real time window "
            f"(fusion_mode={cfg.fusion_mode}, window={cfg.window_size}); "
            "use warm_prefix for window-folded models")
    if cfg.use_hist:
        raise ValueError(
            "streamed calibration does not apply to use_hist models: their "
            "serving runs the FULL-window head every step (the window is "
            "the memory, flamingo_mpt.py:700-740) — there is no streamed "
            "carry regime to match; use the default folded calibration")
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    w = cfg.window_size
    s, d = hidden_states.shape[2], hidden_states.shape[3]
    ids = [0] + list(exit_list)
    feats = [hidden_states[i].reshape(-1, w, s, d) for i in ids]
    b = feats[0].shape[0]
    n_exit = len(exit_list)
    probs = (np.full(n_exit, 1.0 / n_exit) if exit_sample_probs is None
             else np.asarray(exit_sample_probs, np.float64))
    # degenerate target (e.g. 9B probs[0]=0 with a max_layer below every
    # exit, where exit_probs' 0/0 renormalization yields NaN): fall back to
    # uniform.  NOT `sum() <= 0` — NaN compares False to everything.
    if not probs.sum() > 0 or not np.all(np.isfinite(probs)):
        probs = np.full(n_exit, 1.0 / n_exit)
    probs = jnp.asarray(probs / probs.sum(), jnp.float32)

    st = None
    if state is not None and cfg.head.use_state:
        st = state.reshape(b, w, -1)

    carry = any_zero_carry(cfg, b)
    per_t = []
    for r in range(warm_rounds + 1):
        scored = r == warm_rounds
        for t in range(w):
            st_t = None if st is None else st[:, t]
            acts, cands = [], []
            for k, f in enumerate(feats):
                out, c_k = any_head_step(extra_exit_params, f[:, t], carry,
                                         cfg, st_t)
                if scored:
                    acts.append(out.actions[:, 0])  # (B, 6k) / feature
                if k > 0:
                    cands.append(c_k)  # commit candidates: exit entries
            if scored and t >= max(w // 2 - 1, 0):
                a = jnp.stack(acts)  # (n_exit+1, B, adim)
                per_t.append(get_delta(a[1:], a[:-1], threshold_type))
            # commit the sampled exit's carry (one scalar draw per step —
            # the serving carry always comes from whichever exit fired)
            idx = jax.random.choice(
                jax.random.fold_in(rng, r * w + t), n_exit, p=probs)
            stacked_c = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                               *cands)
            carry = jax.tree_util.tree_map(
                lambda sc: jnp.take(sc, idx, axis=0), stacked_c)
    delta = jnp.stack(per_t, axis=2)  # (n_exit, B, n_positions)
    return delta.reshape(delta.shape[0], -1)


# ---------------------------------------------------------------------------
# threshold solver (value_net.py:206-272)
# ---------------------------------------------------------------------------


def exit_probs(real_num_exit: int, exit_ratio: float, exit_dist: str = "exp",
               model_name: str = "mpt_dolly_3b") -> np.ndarray:
    if exit_dist == "exp":
        probs = exit_ratio ** np.arange(1, real_num_exit + 1, dtype=np.float64)
    elif exit_dist == "gauss":
        center = exit_ratio
        probs = np.array([math.exp(-(i - center) ** 2 / 2.0)
                          for i in range(real_num_exit)])
    elif exit_dist == "gamma":
        from scipy import stats
        x = np.arange(1, real_num_exit + 1, dtype=np.float64)
        probs = stats.gamma.pdf(x, exit_ratio, scale=2.0)
    else:
        raise ValueError(exit_dist)
    if "mpt_9b" in model_name:
        probs[0] = 0.0  # only exits >= 4th layer for the deep model (value_net.py:235-236)
    return probs / probs.sum()


def solve_thresholds(pred_values: np.ndarray, exit_ratio: float,
                     exit_id_list: Sequence[int], max_layer: int,
                     exit_dist: str = "exp", leq: bool = True,
                     model_name: str = "mpt_dolly_3b"
                     ) -> Tuple[Dict[int, float], np.ndarray]:
    """Pick per-exit thresholds so the sample exit distribution matches the
    target ``exit_ratio**k`` schedule (value_net.py:206-272).

    pred_values: (n_exit, n_sample) calibration deltas (gathered across hosts).
    Returns ({exit_id: threshold}, probs).
    """
    pred_values = np.asarray(pred_values)
    n_stage, n_sample = pred_values.shape
    real_ids = [x for x in exit_id_list if x <= max_layer]
    real_num_exit = len(real_ids)
    probs = exit_probs(real_num_exit, exit_ratio, exit_dist, model_name)

    sorted_idx = np.argsort(pred_values, axis=1)
    if not leq:
        sorted_idx = sorted_idx[:, ::-1]
    filtered = np.zeros(n_sample)
    T = np.full(real_num_exit, -1e8 if leq else 1e8, dtype=np.float64)

    for k in range(real_num_exit - 1):
        count = 0
        out_n = math.floor(n_sample * probs[k])
        for i in range(n_sample):
            ori_idx = sorted_idx[k][i]
            if filtered[ori_idx] == 0:
                count += 1
                if count == out_n:
                    T[k] = pred_values[k][ori_idx]
                    break
        if leq:
            filtered += (pred_values[k] <= T[k]).astype(np.float64)
        else:
            filtered += (pred_values[k] >= T[k]).astype(np.float64)

    T[real_num_exit - 1] = 1e8 if leq else -1e8
    thresholds = {int(real_ids[i]): float(T[i]) for i in range(real_num_exit)}
    return thresholds, probs


# ---------------------------------------------------------------------------
# exit controller (host-side state; device work happens in the exit buckets)
# ---------------------------------------------------------------------------


@dataclass
class ExitController:
    """Decision state for dynamic exit (ExitController, value_net.py:163-297).

    Host-side: holds thresholds, the steps_per_stage stage memory and the
    previous committed action.  The per-exit delta itself is computed on
    device inside the exit-bucket program (see eval/rollout); this class only
    compares the returned scalar against the threshold — the reference's
    ``forward`` (value_net.py:278-297) split the same way.
    """

    exit_id_list: Sequence[int]
    steps_per_stage: int = 1
    leq: bool = True
    max_layer: int = 12  # counts layers, not index
    thresholds: Optional[Dict[int, float]] = None
    threshold_type: str = "L2"

    cur_step: int = 0
    cur_exit_id: int = 10 ** 9
    prev_action: Optional[np.ndarray] = None
    action_list: List = field(default_factory=list)

    def __post_init__(self):
        self.effective_max = min(self.max_layer - 1, self.exit_id_list[-1])

    def set_thresholds(self, thresholds: Dict[int, float]) -> None:
        self.thresholds = thresholds

    def set_threshold_values(self, values: Sequence[float]) -> None:
        """Direct threshold setting for BO search (value_net.py:177-183)."""
        real_ids = [x for x in self.exit_id_list if x <= self.effective_max]
        assert len(values) == len(real_ids)
        self.thresholds = {int(i): float(v) for i, v in zip(real_ids, values)}

    def reset_episode(self) -> None:
        self.cur_exit_id = 10 ** 9
        self.prev_action = None
        self.action_list = []

    def set_timestep(self, t: int) -> None:
        self.cur_step = t

    def reuse_stage_exit(self) -> bool:
        """True if mid-stage: reuse previous exit id (value_net.py:284-286)."""
        return self.steps_per_stage > 1 and (self.cur_step % self.steps_per_stage != 0)

    def should_exit(self, exit_id: int, delta: float) -> bool:
        """Threshold compare for one evaluated exit (value_net.py:288-297)."""
        assert self.thresholds is not None, "set thresholds before rollout"
        if exit_id not in self.exit_id_list:
            return False
        take = (delta <= self.thresholds[exit_id]) if self.leq else \
               (delta >= self.thresholds[exit_id])
        if take or exit_id >= self.effective_max:
            self.cur_exit_id = exit_id
            return True
        return False

    def record_action(self, action) -> None:
        """action: (arm, gripper_prob) tuple or bare arm array."""
        self.action_list.append(action)
        self.prev_action = action[0] if isinstance(action, tuple) else action

    def get_ensemble_action(self):
        """Mean of the last two evaluated exits' actions — BOTH arm and
        gripper (value_net.py:92-95 zips and means the pairs)."""
        assert len(self.action_list) > 0
        last = self.action_list[-2:]
        if isinstance(last[0], tuple):
            arms, grips = zip(*last)
            return (np.mean(np.stack(arms, 0), axis=0),
                    np.mean(np.stack(grips, 0), axis=0))
        return np.mean(np.stack(last, 0), axis=0)
