"""World <-> tool-center-point action frame conversion (JAX).

Port of robot_flamingo/utils.py:16-78 for the ``--tcp_rel`` training option.
Euler convention "XYZ" intrinsic (pytorch3d convention: R = X(a) @ Y(b) @
Z(c) applied to column vectors).  Orientation deltas are downscaled by 0.01
to act as pseudo-infinitesimal rotations and rescaled after, exactly like the
reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1)], -2)


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1)], -2)


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1)], -2)


def euler_angles_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """XYZ convention: R = Rx(a) @ Ry(b) @ Rz(c); euler (..., 3)."""
    return _rx(euler[..., 0]) @ _ry(euler[..., 1]) @ _rz(euler[..., 2])


def matrix_to_euler_angles(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the above (pytorch3d XYZ extraction)."""
    # For R = Rx Ry Rz: m[0,2] = sin(b)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], -1)


def _wrap(x):
    x = jnp.where(x < -np.pi, x + 2 * np.pi, x)
    return jnp.where(x > np.pi, x - 2 * np.pi, x)


def world_to_tcp_frame(action: jnp.ndarray, robot_obs: jnp.ndarray) -> jnp.ndarray:
    """action (..., 7) world-frame relative -> tcp-frame relative."""
    shape = action.shape
    action = action.reshape(-1, 7).astype(jnp.float32)
    robot_obs = robot_obs.reshape(-1, robot_obs.shape[-1]).astype(jnp.float32)
    world_T_tcp = euler_angles_to_matrix(robot_obs[:, 3:6])
    tcp_T_world = jnp.swapaxes(world_T_tcp, -1, -2)  # rotation inverse
    pos_tcp = (tcp_T_world @ action[:, :3, None])[..., 0]
    orn_w_rel = action[:, 3:6] * 0.01
    world_T_tcp_new = euler_angles_to_matrix(robot_obs[:, 3:6] + orn_w_rel)
    tcp_new_T_tcp_old = jnp.swapaxes(world_T_tcp_new, -1, -2) @ world_T_tcp
    orn_tcp = _wrap(matrix_to_euler_angles(tcp_new_T_tcp_old)) * 100.0
    out = jnp.concatenate([pos_tcp, orn_tcp, action[:, -1:]], -1)
    return out.reshape(shape)


def tcp_to_world_frame(action: jnp.ndarray, robot_obs: jnp.ndarray) -> jnp.ndarray:
    """action (..., 7) tcp-frame relative -> world-frame relative."""
    shape = action.shape
    action = action.reshape(-1, 7).astype(jnp.float32)
    robot_obs = robot_obs.reshape(-1, robot_obs.shape[-1]).astype(jnp.float32)
    world_T_tcp = euler_angles_to_matrix(robot_obs[:, 3:6])
    pos_w = (world_T_tcp @ action[:, :3, None])[..., 0]
    orn_tcp_rel = action[:, 3:6] * 0.01
    tcp_new_T_tcp_old = euler_angles_to_matrix(orn_tcp_rel)
    world_T_tcp_new = world_T_tcp @ jnp.swapaxes(tcp_new_T_tcp_old, -1, -2)
    orn_w_new = matrix_to_euler_angles(world_T_tcp_new)
    orn_w_rel = _wrap(orn_w_new - robot_obs[:, 3:6]) * 100.0
    out = jnp.concatenate([pos_w, orn_w_rel, action[:, -1:]], -1)
    return out.reshape(shape)
