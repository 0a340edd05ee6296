"""Training-free inference acceleration: action caching + visual-token
caching (optional modes composing with dynamic early exit).

Implements the two cache ideas from the retrieved VLA-acceleration papers
(PAPERS.md):
  * action caching ("Training-Free Acceleration for VLA Models with Action
    Caching and Refinement"): consecutive CALVIN frames are often nearly
    identical; when the frame delta is below a threshold, replay the cached
    action (optionally refreshed every ``refresh_every`` steps) and skip the
    policy entirely.  NOTE: for LSTM-carry heads this is an approximation —
    the carry does not advance on cache hits (the papers target carry-free
    VLAs); keep taus tight or prefer vision caching for exact head state.
  * visual-token caching ("Adaptive Visual Token Caching"): reuse the
    ViT+perceiver media latents (the dominant shallow-exit cost) when the
    frame changed little, but ALWAYS run the decoder + head — head carry
    and exit decisions stay exact, only the vision latents are stale.

Both gates run as one tiny jitted program (downsampled pixel-space mean-L2
between consecutive frames) so the host sees a single scalar.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("stride",))
def frame_delta(a: jnp.ndarray, b: jnp.ndarray, stride: int = 4) -> jnp.ndarray:
    """Mean-L2 between two (..., 3, H, W) or (..., H, W, 3) frames on a
    ``stride``-subsampled grid, normalized to [0, ~1] for uint8-scale inputs."""
    a = a.astype(jnp.float32).reshape(-1, *a.shape[-2:])
    b = b.astype(jnp.float32).reshape(-1, *b.shape[-2:])
    da = a[..., ::stride, ::stride] - b[..., ::stride, ::stride]
    return jnp.sqrt(jnp.mean(jnp.square(da)))


class ActionCachePolicy:
    """Wrap any policy (DeerPolicy / FusedDeerPolicy / ScanDeerPolicy):
    replay the previous action while the observation is static.

    Cache hits are counted in ``hits`` / total in ``steps``;
    ``last_exit_layer`` reports -1 on hits so exit histograms / FLOPs
    accounting see a zero-layer action.
    """

    def __init__(self, policy, tau: float = 0.03, refresh_every: int = 5):
        self.policy = policy
        self.cfg = policy.cfg
        self.tau = tau
        self.refresh_every = max(1, refresh_every)
        self.hits = 0
        self.steps = 0
        self.reset()

    def reset(self):
        self.policy.reset()
        self._prev_frame = None
        self._cached_action = None
        self._since_miss = 0
        self.last_exit_layer = getattr(self.policy, "last_exit_layer", -1)

    def set_timestep(self, t: int):
        self.policy.set_timestep(t)

    def step(self, image, gripper, input_ids, attention_mask, state=None):
        self.steps += 1
        hit = False
        if (self._cached_action is not None
                and self._since_miss < self.refresh_every):
            d = float(frame_delta(image, self._prev_frame))
            hit = d <= self.tau
        if hit:
            self.hits += 1
            self._since_miss += 1
            self.last_exit_layer = -1  # zero LLM layers ran
            return self._cached_action
        self._prev_frame = image
        self._since_miss = 1
        action = self.policy.step(image, gripper, input_ids, attention_mask,
                                  state)
        self._cached_action = action
        self.last_exit_layer = self.policy.last_exit_layer
        return action


class _VisionCacheBase:
    """Shared tau-gated visual-token caching shell: miss -> run the engine's
    encode program and stash the prefix; hit -> reuse it and dispatch only
    the decode.  Subclasses supply _encode/_decode for their engine."""

    def __init__(self, inner, tau: float = 0.05):
        self.inner = inner
        self.cfg = inner.cfg
        self.tau = tau
        self.encode_hits = 0
        self.steps = 0
        self.reset()

    def reset(self):
        self.inner.reset()
        self._prev_frame = None
        self._cached = None  # engine-specific encoded prefix

    def set_timestep(self, t: int):
        self.inner.set_timestep(t)

    @property
    def last_exit_layer(self):
        return self.inner.last_exit_layer

    @property
    def carry(self):
        return self.inner.carry

    def step(self, image, gripper, input_ids, attention_mask, state=None):
        self.steps += 1
        hit = False
        if self._cached is not None:
            hit = float(frame_delta(image, self._prev_frame)) <= self.tau
        if not hit:
            self._cached = self._encode(image, gripper, input_ids,
                                        attention_mask, state)
            self._prev_frame = image
        self.encode_hits += int(hit)
        return self._decode(self._cached, attention_mask, state)


class VisionCacheScanPolicy(_VisionCacheBase):
    """While-loop-engine variant of visual-token caching: the scan engine's
    encode (ViT+perceiver+embed) and decode (dynamic-exit while_loop) are
    separate jit programs, so a near-identical frame reuses the cached
    (media, x, mloc) and dispatches only the decode.  Exit decisions, head
    carry and actions stay exact — only the vision conditioning is stale.
    """

    def set_thresholds(self, thresholds):
        self.inner.set_thresholds(thresholds)

    def _encode(self, image, gripper, input_ids, attention_mask, state):
        assert state is None, "the while-loop engine is stateless"
        return self.inner.encode(image, gripper, input_ids)

    def _decode(self, cached, attention_mask, state):
        media, x, mloc = cached
        return self.inner.step_from_encoded(media, x, mloc, attention_mask)


class VisionCacheDeerPolicy(_VisionCacheBase):
    """DeerPolicy variant with visual-token caching: when the frame delta is
    below tau, reuse the previous step's media latents and goal-token
    embedding (skipping the dual ViT + perceiver encode) and run only the
    decoder buckets + head.  Head carries, exit decisions and actions follow
    the exact dynamic-exit protocol — only the vision conditioning is stale.

    Composition around eval/policy.DeerPolicy's split programs: the decode
    half IS DeerPolicy.step_from_encoded (one implementation; an earlier
    duplicated tail here went stale and mishandled vit_concat state).

    State models are refused: the proprio state_fc token is part of the
    cached media latents and changes every step — serving them from a stale
    cache would silently feed old proprio into the policy.
    """

    def __init__(self, inner, tau: float = 0.05):
        from deer_vla_tpu.eval.policy import DeerPolicy
        assert isinstance(inner, DeerPolicy), \
            "vision caching needs the bucketed DeerPolicy (split encode)"
        if inner.cfg.use_state or inner.cfg.head.use_state:
            raise NotImplementedError(
                "--vision_cache_tau cannot serve state models: the proprio "
                "token is part of the cached media latents and changes "
                "every step")
        super().__init__(inner, tau)

    def _encode(self, image, gripper, input_ids, attention_mask, state):
        return self.inner._encode_prefix(
            self.inner.enc_params, self.inner.enc_stacked, image, gripper,
            input_ids, attention_mask, state)

    def _decode(self, cached, attention_mask, state):
        media, x0, mloc = cached
        return self.inner.step_from_encoded(media, x0, mloc, attention_mask,
                                            state)


class FrameCachePolicy:
    """Rolling per-frame ViT-token cache for WINDOW-FOLDED serving
    (vit_concat / use_hist), VERDICT r2 item 7.

    The windowed adapter protocol re-encodes all W window frames every env
    step (the reference's uncached img_queue, eval_utils.py:344-386), so
    (W-1)/W of steady-state vision FLOPs are redundant.  This wrapper keeps
    a device-side queue of per-frame ViT tokens (position-independent —
    use_hist frame embeddings are applied at fuse time, see
    models/flamingo.vision_tokens) and per step:

      1. encodes ONLY the newest frame (ScanDeerPolicy.encode_frame);
      2. concatenates the cached window (one tiny jitted program);
      3. runs perceiver + window fold + dynamic-exit decode in one dispatch
         (ScanDeerPolicy.step_from_tokens).

    Exact by construction: the fused program consumes the same per-frame
    token values the full re-encode would produce (the reference's
    feature_cache analogue, eval_utils.py:371, without its staleness).

    Adapter contract: ``feeds_single_frame`` — CalvinPolicyAdapter passes
    only the newest frame (no host-side image window) while keeping the
    per-frame state queue and use_hist text tiling.
    """

    feeds_single_frame = True

    def __init__(self, inner):
        from deer_vla_tpu.eval.scan_policy import ScanDeerPolicy
        assert isinstance(inner, ScanDeerPolicy), \
            "the frame cache drives ScanDeerPolicy's encode/decode split"
        cfg = inner.cfg
        assert cfg.fusion_mode == "vit_concat" or cfg.use_hist, \
            "frame caching only pays for window-folded models"
        self.inner = inner
        self.cfg = cfg
        self.window = cfg.window_size
        self._cat = jax.jit(lambda ts: jnp.concatenate(ts, axis=0))
        self.reset()

    def reset(self):
        self.inner.reset()
        from collections import deque
        self._rgb_q = deque(maxlen=self.window)
        self._grip_q = deque(maxlen=self.window)

    def set_timestep(self, t: int):
        self.inner.set_timestep(t)

    def set_thresholds(self, thresholds):
        self.inner.set_thresholds(thresholds)

    @property
    def last_exit_layer(self):
        return self.inner.last_exit_layer

    @property
    def carry(self):
        return self.inner.carry

    def step(self, image, gripper, input_ids, attention_mask, state=None):
        """image/gripper: the NEWEST frame only, (1, 1, 1, 3, H, W); state:
        per-frame rows for the full window (the adapter's state queue)."""
        if image.shape[0] != 1:
            raise ValueError(
                f"FrameCachePolicy.step takes the newest frame only "
                f"(got image batch {image.shape[0]}); the token window is "
                "cached on device")
        tok_rgb, tok_grip = self.inner.encode_frame(image, gripper)
        if not self._rgb_q:
            # episode start: left-pad with the first frame's tokens
            # (eval_utils.py:344-349 repeats the first frame)
            for _ in range(self.window):
                self._rgb_q.append(tok_rgb)
                self._grip_q.append(tok_grip)
        else:
            self._rgb_q.append(tok_rgb)
            self._grip_q.append(tok_grip)
        tr = self._cat(list(self._rgb_q))
        tg = (self._cat(list(self._grip_q))
              if self._grip_q[0] is not None else None)
        return self.inner.step_from_tokens(tr, tg, input_ids,
                                           attention_mask, state)
