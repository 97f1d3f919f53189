"""Observation kernels: pseudo-lidar, compass, ego velocity/acceleration.

Vectorized over objects (the reference loops a Python `for pos in positions`
with scatter updates — engine.py:846-900; here each lidar is one
one-hot-max reduction, branch-free and fully fused by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def ego_xy(pos_xy, robot_pos, robot_mat):
    """Egocentric XY vector to a world position (reference engine.py:817-826).

    pos_xy: (..., 2); returns (..., 2) in the robot frame.
    """
    pos3 = jnp.concatenate(
        [pos_xy, jnp.zeros_like(pos_xy[..., :1])], axis=-1
    )
    world = pos3 - robot_pos  # broadcast (..., 3)
    # row-vector @ R == R^T v: world -> robot frame (reference engine.py:826)
    return jnp.einsum("...i,ij->...j", world, robot_mat)[..., :2]


def obs_lidar_pseudo(
    positions_xy, robot_pos, robot_mat,
    num_bins: int, exp_gain: float, max_dist, alias: bool,
):
    """Pseudo-lidar over object positions (reference engine.py:846-900).

    positions_xy: (n, 2) world XY of objects.
    Returns (num_bins,) readings in [0, 1]: exp(-gain*dist) closeness (or
    linear when max_dist is set), max-pooled into bins, with neighbor
    aliasing so adjacent bins sense fractional angle offsets.
    """
    z = ego_xy(positions_xy, robot_pos, robot_mat)  # (n, 2)
    dist = jnp.linalg.norm(z, axis=-1)
    angle = jnp.arctan2(z[:, 1], z[:, 0]) % (2.0 * jnp.pi)
    bin_size = (2.0 * jnp.pi) / num_bins
    which_bin = (angle / bin_size).astype(jnp.int32)
    bin_angle = bin_size * which_bin

    if max_dist is None:
        sensor = jnp.exp(-exp_gain * dist)
    else:
        sensor = jnp.maximum(0.0, max_dist - dist) / max_dist

    contrib_bins = [which_bin]
    contrib_vals = [sensor]
    if alias:
        alias_w = (angle - bin_angle) / bin_size  # in [0, 1)
        contrib_bins += [
            (which_bin + 1) % num_bins,
            (which_bin - 1) % num_bins,
        ]
        contrib_vals += [alias_w * sensor, (1.0 - alias_w) * sensor]

    bins = jnp.concatenate(contrib_bins)  # (kn,)
    vals = jnp.concatenate(contrib_vals)  # (kn,)
    onehot = jax.nn.one_hot(bins, num_bins, dtype=vals.dtype)  # (kn, B)
    return jnp.max(onehot * vals[:, None], axis=0)


def obs_compass(pos_xy, robot_pos, robot_mat):
    """Egocentric compass vector to a position (reference engine.py:834-844)."""
    return ego_xy(pos_xy, robot_pos, robot_mat)


def ego_vel_acc(
    robot_pos, robot_pos_last, robot_pos_last_last,
    last_done, last_last_done, robot_mat, dt,
):
    """Robot-frame planar velocity/acceleration from a 3-frame position
    history with done-masking (reference engine.py:902-929)."""
    p_last = jnp.where(last_done > 0.0, robot_pos, robot_pos_last)
    p_last_last = jnp.where(
        (last_last_done + last_done) > 0.0, p_last, robot_pos_last_last
    )
    vel_w = (robot_pos - p_last) / dt
    last_vel_w = (p_last - p_last_last) / dt
    acc_w = (vel_w - last_vel_w) / dt
    vel = jnp.einsum("i,ij->j", vel_w, robot_mat)[:2]
    acc = jnp.einsum("i,ij->j", acc_w, robot_mat)[:2]
    return vel, acc
