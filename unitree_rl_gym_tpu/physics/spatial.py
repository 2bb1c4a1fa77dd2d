"""Spatial (6-D) rigid-body algebra, Featherstone convention.

Building block for the TPU-native articulated dynamics that replaces the
reference's external Isaac Gym / PhysX backend (SURVEY.md §1.5). Spatial
vectors are ordered ``[angular(3); linear(3)]`` and expressed in *body*
(local) coordinates. Transforms are carried as ``(E, r)`` pairs —
``E``: 3x3 rotation taking A-frame coords to B-frame coords,
``r``: origin of B expressed in A — instead of explicit 6x6 Plücker
matrices, which keeps the hot path on small fused VPU ops.

All functions are pure jnp, broadcast over leading batch dimensions, and are
used inside jit/vmap/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unitree_rl_gym_tpu.utils.math import skew

# A spatial transform is the pair (E, r); motion transform in Plücker form:
#   X = [[ E,        0 ],
#        [-E @ skew(r), E ]]


def xform_compose(E1, r1, E2, r2):
    """Compose X1∘X2: first apply X2 (A->B), then X1 (B->C). Returns (E, r)
    of the A->C transform. Featherstone RBDA eq. 2.26."""
    return E1 @ E2, r2 + jnp.einsum("...ji,...j->...i", E2, r1)


def xform_inv(E, r):
    """Inverse transform (B->A from A->B)."""
    return jnp.swapaxes(E, -1, -2), -jnp.einsum("...ij,...j->...i", E, r)


def xform_motion(E, r, v):
    """Apply motion transform: v_B = X v_A for v = [w; v]."""
    w, vl = v[..., :3], v[..., 3:]
    wB = jnp.einsum("...ij,...j->...i", E, w)
    vB = jnp.einsum("...ij,...j->...i", E, vl - jnp.cross(r, w))
    return jnp.concatenate((wB, vB), axis=-1)


def xform_motion_inv(E, r, v):
    """Apply inverse motion transform: v_A = X^{-1} v_B."""
    w, vl = v[..., :3], v[..., 3:]
    Et = jnp.swapaxes(E, -1, -2)
    wA = jnp.einsum("...ij,...j->...i", Et, w)
    vA = jnp.einsum("...ij,...j->...i", Et, vl) + jnp.cross(r, wA)
    return jnp.concatenate((wA, vA), axis=-1)


def xform_force(E, r, f):
    """Apply force transform: f_B = X^{-*} f_A ... for f = [n; f]:
    n_B = E(n - r×f), f_B = E f."""
    n, fl = f[..., :3], f[..., 3:]
    nB = jnp.einsum("...ij,...j->...i", E, n - jnp.cross(r, fl))
    fB = jnp.einsum("...ij,...j->...i", E, fl)
    return jnp.concatenate((nB, fB), axis=-1)


def xform_force_inv(E, r, f):
    """Inverse force transform: f_A = X^{*} f_B (child force -> parent)."""
    n, fl = f[..., :3], f[..., 3:]
    Et = jnp.swapaxes(E, -1, -2)
    fA = jnp.einsum("...ij,...j->...i", Et, fl)
    nA = jnp.einsum("...ij,...j->...i", Et, n) + jnp.cross(r, fA)
    return jnp.concatenate((nA, fA), axis=-1)


def motion_matrix(E, r):
    """Explicit 6x6 Plücker motion matrix (used for CRBA inertia transforms
    where matmul form is clearer; XLA maps these to batched MXU ops)."""
    Z = jnp.zeros_like(E)
    top = jnp.concatenate((E, Z), axis=-1)
    bot = jnp.concatenate((-E @ skew(r), E), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def crm(v):
    """Spatial motion cross-product operator v ×."""
    w, vl = v[..., :3], v[..., 3:]
    sw, sv = skew(w), skew(vl)
    Z = jnp.zeros_like(sw)
    top = jnp.concatenate((sw, Z), axis=-1)
    bot = jnp.concatenate((sv, sw), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def cross_motion(v, m):
    """v ×m m without materializing the 6x6 operator."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        (jnp.cross(w, mw), jnp.cross(vl, mw) + jnp.cross(w, ml)), axis=-1
    )


def cross_force(v, f):
    """v ×f f = -(v ×m)^T f."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        (jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)), axis=-1
    )


def spatial_inertia(mass, com, inertia_com):
    """6x6 spatial inertia about the body frame origin.

    I = [[ I_com + m cx cx^T,  m cx ],
         [ m cx^T,             m 1  ]]
    with cx = skew(com). Built from the URDF <inertial> blocks
    (mass, CoM offset, rotational inertia about the CoM).
    """
    cx = skew(com)
    m1 = mass[..., None, None] * jnp.eye(3)
    top = jnp.concatenate(
        (inertia_com + mass[..., None, None] * cx @ jnp.swapaxes(cx, -1, -2),
         mass[..., None, None] * cx),
        axis=-1,
    )
    bot = jnp.concatenate((mass[..., None, None] * jnp.swapaxes(cx, -1, -2), m1), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def transform_inertia_to_parent(E, r, I_child):
    """I_parent = X^T I_child X for the motion transform X = (E, r) taking
    parent coords to child coords (composite rigid-body accumulation)."""
    X = motion_matrix(E, r)
    return jnp.swapaxes(X, -1, -2) @ I_child @ X


def rot_axis(axis, q):
    """Coordinate-rotation matrix E for a revolute joint of angle ``q`` about
    unit ``axis``: takes parent-aligned (zero-config) coords to child coords.
    E = R(axis, q)^T via Rodrigues."""
    c = jnp.cos(q)
    s = jnp.sin(q)
    ax = skew(axis)
    R = (
        jnp.eye(3) * c[..., None, None]
        + s[..., None, None] * ax
        + (1.0 - c)[..., None, None] * axis[..., :, None] * axis[..., None, :]
    )
    return jnp.swapaxes(R, -1, -2)


def rpy_matrix(rpy):
    """URDF rpy (fixed-axis XYZ) -> rotation matrix R = Rz(y) Ry(p) Rx(r)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    R = jnp.stack(
        (
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ),
        axis=-1,
    )
    return R.reshape(R.shape[:-1] + (3, 3))
