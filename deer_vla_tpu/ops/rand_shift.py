"""RandomShiftsAug (DrQ-style pad+random-crop) as a vectorized JAX op.

Reference: robot_flamingo/data/data.py:137-194.  The torch version pads with
'replicate' and uses grid_sample — but its shifts are integer pixel multiples
sampled on the normalized grid, and all sample points land exactly on pixel
centers, so bilinear grid_sample degenerates to an integer crop.  We therefore
implement it as a dynamic-slice crop of the edge-padded image: numerically
identical and far cheaper on TPU (no gather).

Shift distributions match the reference:
  * per-image  (`random_shift`):       shift ~ U{0, ..., 2*pad}
  * per-trajectory (`random_shift_traj`): shift ~ U{1, ..., 2*pad}
    (data.py:184 uses randint(1, 2p+1)); the same shift is shared across the
    time dimension of a trajectory when traj_cons collation applies the aug
    per-trajectory (data.py:787-795).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _crop_one(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray, pad: int):
    """img: (C, H+2p, W+2p); returns (C, H, W) starting at (sy, sx)."""
    c, hp, wp = img.shape
    h = hp - 2 * pad
    return jax.lax.dynamic_slice(img, (0, sy, sx), (c, h, h))


def random_shift(key, x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """x: (N, C, H, W) -> same shape, random integer shift per image."""
    n, c, h, w = x.shape
    assert h == w
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    # torch randint(0, 2p+1) on (n, 2) -> (x_shift, y_shift); grid coord 0 is
    # width. The crop offset equals the sampled shift directly.
    shifts = jax.random.randint(key, (n, 2), 0, 2 * pad + 1)
    return jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(
        xp, shifts[:, 1], shifts[:, 0], pad)


def random_shift_traj(key, x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """x: (N, T, C, H, W); one shift per (n*t) sample drawn from U{1..2p}
    (faithful to forward_traj, data.py:168-194)."""
    n, t, c, h, w = x.shape
    xf = x.reshape(n * t, c, h, w)
    xp = jnp.pad(xf, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    shifts = jax.random.randint(key, (n * t, 2), 1, 2 * pad + 1)
    out = jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(
        xp, shifts[:, 1], shifts[:, 0], pad)
    return out.reshape(n, t, c, h, w)
