"""Quaternion / rotation math for the TPU-native legged-RL stack.

Pure-functional JAX replacements for the semantics the reference stack gets
from ``isaacgym.torch_utils`` (quat_rotate_inverse, quat_apply, ...),
``legged_gym/utils/math.py`` (wrap_to_pi, quat_apply_yaw) and
``legged_gym/utils/isaacgym_utils.py:11-30`` (get_euler_xyz).

Conventions
-----------
* Quaternions are stored ``[x, y, z, w]`` (scalar-last), matching the
  reference's Isaac Gym convention (e.g. ``legged_robot_config.py:103``
  ``rot = [0,0,0,1]``). All functions broadcast over leading batch dims.
* All functions are shape-polymorphic pure jnp; they are used inside jit /
  vmap / scan and must stay free of Python control flow on traced values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-9) -> jax.Array:
    """Safe L2 normalization along ``axis``."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b for xyzw quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        (
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ),
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate((-q[..., :3], q[..., 3:4]), axis=-1)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` by quaternion(s) ``q`` (body -> world).

    Same semantics as isaacgym.torch_utils.quat_rotate / quat_apply.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


quat_apply = quat_rotate


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate ``v`` by the inverse of ``q`` (world -> body).

    Matches isaacgym.torch_utils.quat_rotate_inverse used throughout the
    reference env (legged_robot.py:164-166, 685-690).
    """
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """xyzw quaternion from rotation ``angle`` about unit ``axis``."""
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate((xyz, w), axis=-1)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """xyzw quaternion -> 3x3 rotation matrix (body -> world)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = jnp.stack(
        (
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ),
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate orientation with world-frame angular velocity.

    q' = normalize(q + 0.5*dt * [omega,0] ⊗ q) — first-order exponential-map
    approximation (PhysX-style semi-implicit update).
    """
    omega_quat = jnp.concatenate(
        (omega_world, jnp.zeros_like(omega_world[..., :1])), axis=-1
    )
    dq = 0.5 * dt * quat_mul(omega_quat, q)
    return normalize(q + dq)


def get_euler_xyz(q: jax.Array) -> jax.Array:
    """Quaternion -> stacked (roll, pitch, yaw), matching the reference
    ``isaacgym_utils.get_euler_xyz`` (isaacgym_utils.py:11-30) used for the
    tip-over termination check (legged_robot.py:718)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack((roll, pitch, yaw), axis=-1)


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the yaw component of ``q`` to ``v`` (math.py:8-13)."""
    q_yaw = jnp.concatenate(
        (jnp.zeros_like(q[..., :2]), q[..., 2:4]), axis=-1
    )
    return quat_rotate(normalize(q_yaw), v)


def quat_from_euler_xyz(roll, pitch, yaw) -> jax.Array:
    """Intrinsic xyz euler -> xyzw quaternion (for tests / init states)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        (
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ),
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Misc math used by the env layer
# ---------------------------------------------------------------------------


def wrap_to_pi(angles: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi]; same algorithm as the reference
    ``utils/math.py:15-18`` (mod into [0,2pi) then shift)."""
    a = jnp.mod(angles, 2.0 * jnp.pi)
    return a - 2.0 * jnp.pi * (a > jnp.pi)


def rand_uniform(key, lo, hi, shape):
    """U(lo, hi) — replacement for isaacgym torch_rand_float."""
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def rand_sqrt_uniform(key, lower, upper, shape):
    """Signed-sqrt-shaped distribution, matching utils/math.py:21-26."""
    r = 2.0 * jax.random.uniform(key, shape) - 1.0
    r = jnp.where(r < 0.0, -jnp.sqrt(-r), jnp.sqrt(r))
    r = (r + 1.0) / 2.0
    return (upper - lower) * r + lower


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> 3x3 skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        (zero, -z, y, z, zero, -x, -y, x, zero), axis=-1
    )
    return m.reshape(m.shape[:-1] + (3, 3))
