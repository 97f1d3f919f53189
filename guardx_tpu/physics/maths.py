"""Quaternion / rotation helpers for the physics engine.

Conventions match MuJoCo: quaternions are (w, x, y, z), rotation matrices act
on column vectors, and ``quat_to_mat(q) @ v`` rotates a body-frame vector into
the world frame.
"""

import jax.numpy as jnp


def quat_mul(a, b):
    """Hamilton product a ⊗ b for (w, x, y, z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (body -> world if q is body orientation)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_mul(quat_mul(q, qv), quat_conj(q))[..., 1:]


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q):
    """3x3 rotation matrix from a (w,x,y,z) quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q, omega_world, dt):
    """Integrate orientation quaternion by world-frame angular velocity.

    Uses the exponential map (exact for constant omega over dt), matching
    MuJoCo's mju_quatIntegrate semantics.
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-style safe normalization: axis * sin(half), w = cos(half)
    safe = jnp.where(angle > 1e-9, angle, 1.0)
    axis = omega_world / safe
    dq = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_to_quat(axis, angle):
    """Quaternion from unit axis and angle (supports broadcast)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def cross(a, b):
    return jnp.cross(a, b)
