"""Device-side image preprocessing (jit-fusable).

The reference preprocesses on CPU workers with torchvision CLIP transforms
(data.py:898-903 via open_clip's image_processor: bicubic resize to 224,
center crop, normalize) and applies RandomShiftsAug on CPU tensors in the
collater (data.py:769-795).  TPU-native: the loader ships raw uint8 frames
(CALVIN: 200x200 static / 84x84 gripper) and resize+normalize+augment run on
device INSIDE the jitted step, fusing with the ViT patch embedding
(BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# OpenAI CLIP normalization constants
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jnp.ndarray, size: int = 224,
                    dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (N, H, W, 3) -> normalized (N, 3, size, size).

    Bicubic resize (CLIP uses PIL BICUBIC; jax 'cubic' is the Keys kernel —
    equivalent family, parity-tested to ~1e-2 which is far below the aug
    noise floor), then CLIP mean/std normalize, then NCHW.
    """
    x = images.astype(dtype) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method="cubic")
    mean = jnp.asarray(CLIP_MEAN, dtype)
    std = jnp.asarray(CLIP_STD, dtype)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)


def preprocess_train_frames(rng, static_u8: jnp.ndarray, gripper_u8: jnp.ndarray,
                            *, rgb_pad: int = 10, gripper_pad: int = 4,
                            traj_cons: bool = True, window: int = 12,
                            size: int = 224, gripper_size: Optional[int] = None,
                            dtype=jnp.float32):
    """Full train-time vision preprocessing for one batch.

    static_u8/gripper_u8: (B*W, H, W, 3) uint8.
    Returns (B*W, 1, 1, 3, size, size) pairs ready for forward_train.
    RandomShiftsAug runs at the *source* resolution like the reference
    (aug before CLIP transform order differs upstream: reference augments
    after resize — we match that by augmenting after resize too).

    gripper_size: target size for the wrist camera (cfg.gripper_res —
    native-res gripper tower); None = same as ``size``.  The reference's
    gripper_pad=4 aug amplitude was chosen for 224-res frames; it is kept
    as-is at native res (84), where it corresponds to the same +-4px jitter
    the 84x84 SOURCE frames would see before upsampling.
    """
    from deer_vla_tpu.ops.rand_shift import random_shift, random_shift_traj

    k1, k2 = jax.random.split(rng)
    stat = clip_preprocess(static_u8, size, dtype)
    grip = clip_preprocess(gripper_u8, gripper_size or size, dtype)
    if rgb_pad > 0:
        if traj_cons:
            b = stat.shape[0] // window
            stat = random_shift_traj(k1, stat.reshape(b, window, *stat.shape[1:]),
                                     rgb_pad).reshape(stat.shape)
        else:
            stat = random_shift(k1, stat, rgb_pad)
    if gripper_pad > 0:
        if traj_cons:
            b = grip.shape[0] // window
            grip = random_shift_traj(k2, grip.reshape(b, window, *grip.shape[1:]),
                                     gripper_pad).reshape(grip.shape)
        else:
            grip = random_shift(k2, grip, gripper_pad)
    stat = stat[:, None, None]  # (B*W, T=1, F=1, 3, H, W)
    grip = grip[:, None, None]
    return stat, grip
