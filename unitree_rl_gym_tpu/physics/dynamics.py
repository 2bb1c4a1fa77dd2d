"""Batched articulated rigid-body dynamics (Featherstone, body coordinates).

TPU-native replacement for the reference's Isaac Gym / PhysX simulation
backend (SURVEY.md §1.5; ``legged_robot.py:627-639`` drives it at 200 Hz).
Instead of PhysX's TGS LCP we use a fixed-iteration velocity-level impulse
PGS contact solver (see :mod:`unitree_rl_gym_tpu.physics.contact`) so that
the entire ``torques -> forward dynamics -> contact solve -> integrate``
substep is one fused, jittable, branch-free function, `vmap`-ed over
thousands of environments and sharded over a device mesh by the caller.

Algorithmic layout per substep (single env; batch via vmap):
  1. forward kinematics  — body poses in world + spatial velocities (body coords)
  2. contact forces      — penalty model, returns per-report-body world forces
                           and per-dynamic-body spatial external forces
  3. RNEA (qdd=0)        — bias forces C(q,v)v + g - f_ext
  4. CRBA                — joint-space inertia matrix H(q)
  5. Cholesky solve      — qdd = H^{-1} (tau - bias)
  6. semi-implicit Euler — v += dt qdd; q += dt v (quaternion exp-map for base)

The kinematic tree is static (13-18 bodies), so all per-body loops unroll at
trace time; per-body math is small fused VPU work over the env batch, and the
[nv x nv] solve is a batched Cholesky that XLA maps onto the MXU.

Generalized coordinates:
  q   = (base_pos[3], base_quat[4 xyzw], joint_q[nj])
  v   = [base_ang(3, body frame); base_lin(3, body frame); joint_qd[nj]]
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from unitree_rl_gym_tpu.physics import spatial as sp
from unitree_rl_gym_tpu.utils import math as tmath


@dataclasses.dataclass(frozen=True)
class DynModel:
    """Static (trace-time) robot model: jnp constants + Python-side tree
    metadata. Built once per task by models/robot.py; closed over by the
    jitted step, never passed as a traced argument."""

    parent: Tuple[int, ...]        # dyn-body parent indices, parent[0] == -1
    joint_axis: jnp.ndarray        # [nj, 3]
    Etree: jnp.ndarray             # [nj, 3, 3]
    rtree: jnp.ndarray             # [nj, 3]
    I_sp: jnp.ndarray              # [nb, 6, 6] spatial inertia, body frame
    base_mass: float               # unscaled base mass (for mass DR scaling)
    armature: float                # rotor inertia added to joint diagonal
    dof_damping: jnp.ndarray       # [nj] passive viscous damping (URDF)
    dof_friction: jnp.ndarray      # [nj] passive dry friction (URDF)
    dof_vel_limit: jnp.ndarray     # [nj] max joint velocity (URDF); PhysX
                                   # clamps articulation joint velocities to
                                   # the dof_props limit each step — without
                                   # this the explicit integrator can pump
                                   # contact energy into unbounded qd
                                   # (inf entries = unlimited)
    dof_lower: jnp.ndarray         # [nj] hard joint limits (URDF); PhysX
    dof_upper: jnp.ndarray         # enforces them as constraints — here a
                                   # projection: clamp q, zero qd into the
                                   # limit (inf entries = unlimited)
    # report bodies / contact points
    rb_dyn_idx: jnp.ndarray        # [nrb]
    rb_rot: jnp.ndarray            # [nrb, 3, 3]
    rb_pos: jnp.ndarray            # [nrb, 3]
    cp_dyn: jnp.ndarray            # [ncp] dynamic body of each contact point
    cp_body: jnp.ndarray           # [ncp] report body of each contact point
    cp_pos: jnp.ndarray            # [ncp, 3] offset in dyn body frame
    cp_radius: jnp.ndarray         # [ncp]
    gravity: jnp.ndarray           # [3] world gravity

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def nj(self) -> int:
        return self.nb - 1

    @property
    def nv(self) -> int:
        return self.nb + 5  # 6 + nj


def fk(model: DynModel, base_pos, base_quat, joint_q, v):
    """Forward kinematics.

    Returns:
      R_w:   [nb, 3, 3] body->world rotations
      p_w:   [nb, 3]    body origins in world
      X_up:  ([nj,3,3], [nj,3]) parent->child motion transforms
      v_b:   [nb, 6]    spatial velocity of each body, own-body coords
    """
    nb = model.nb
    E_j = sp.rot_axis(model.joint_axis, joint_q)        # [nj,3,3]
    E_up = E_j @ model.Etree                            # [nj,3,3]
    r_up = model.rtree                                  # [nj,3]

    R0 = tmath.quat_to_rotmat(base_quat)
    R_w = [R0]
    p_w = [base_pos]
    v_b = [v[:6]]
    for i in range(1, nb):
        par = model.parent[i]
        j = i - 1
        R_w.append(R_w[par] @ E_up[j].T)
        p_w.append(p_w[par] + R_w[par] @ r_up[j])
        vi = sp.xform_motion(E_up[j], r_up[j], v_b[par])
        S_qd = jnp.concatenate((model.joint_axis[j] * v[6 + j], jnp.zeros(3)))
        v_b.append(vi + S_qd)
    return (
        jnp.stack(R_w),
        jnp.stack(p_w),
        (E_up, r_up),
        jnp.stack(v_b),
    )


def _scaled_inertias(model: DynModel, mass_scale):
    """Per-env spatial inertias with the base inertia scaled by the
    domain-randomized added-mass factor (uniform-density scaling, matching
    PhysX recomputeInertia semantics, legged_robot.py:472-483)."""
    scale = jnp.ones((model.nb,)).at[0].set(mass_scale)
    return model.I_sp * scale[:, None, None]


def velocity_prop(model: DynModel, E_up, r_up, v):
    """Propagate a generalized velocity [nv] into per-body spatial
    velocities [nb, 6] (the velocity half of :func:`fk`; used by the contact
    solver to refresh point velocities between PGS iterations)."""
    v_b = [v[:6]]
    for i in range(1, model.nb):
        j = i - 1
        vi = sp.xform_motion(E_up[j], r_up[j], v_b[model.parent[i]])
        S_qd = jnp.concatenate((model.joint_axis[j] * v[6 + j], jnp.zeros(3)))
        v_b.append(vi + S_qd)
    return jnp.stack(v_b)


def bias_forces(model: DynModel, fk_out, v, f_ext, mass_scale):
    """RNEA with qdd = 0: generalized bias C(q,v)v + g - f_ext, shape [nv].
    ``f_ext``: [nb, 6] spatial forces in body coords."""
    nb, nj = model.nb, model.nj
    R_w, p_w, (E_up, r_up), v_b = fk_out
    I_sp = _scaled_inertias(model, mass_scale)
    g_body = R_w[0].T @ model.gravity
    a = [jnp.concatenate((jnp.zeros(3), -g_body))]
    for i in range(1, nb):
        j = i - 1
        ai = sp.xform_motion(E_up[j], r_up[j], a[model.parent[i]])
        S = jnp.concatenate((model.joint_axis[j], jnp.zeros(3)))
        ai = ai + sp.cross_motion(v_b[i], S * v[6 + j])
        a.append(ai)
    f = []
    for i in range(nb):
        fi = (
            I_sp[i] @ a[i]
            + sp.cross_force(v_b[i], I_sp[i] @ v_b[i])
            - f_ext[i]
        )
        f.append(fi)
    bias_j = [None] * nj
    for i in range(nb - 1, 0, -1):
        j = i - 1
        S = jnp.concatenate((model.joint_axis[j], jnp.zeros(3)))
        bias_j[j] = S @ f[i]
        f[model.parent[i]] = f[model.parent[i]] + sp.xform_force_inv(
            E_up[j], r_up[j], f[i]
        )
    return jnp.concatenate((f[0], jnp.stack(bias_j) if nj else jnp.zeros(0)))


def mass_matrix(model: DynModel, fk_out, mass_scale):
    """CRBA joint-space inertia H(q) [nv, nv] (+armature on the diagonal)."""
    nb = model.nb
    _, _, (E_up, r_up), _ = fk_out
    I_sp = _scaled_inertias(model, mass_scale)
    Ic = [I_sp[i] for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        j = i - 1
        Ic[model.parent[i]] = Ic[model.parent[i]] + sp.transform_inertia_to_parent(
            E_up[j], r_up[j], Ic[i]
        )
    H = jnp.zeros((model.nv, model.nv))
    H = H.at[:6, :6].set(Ic[0])
    for i in range(1, nb):
        j = i - 1
        S = jnp.concatenate((model.joint_axis[j], jnp.zeros(3)))
        F = Ic[i] @ S
        H = H.at[6 + j, 6 + j].set(S @ F + model.armature)
        k = i
        while model.parent[k] != -1:
            F = sp.xform_force_inv(E_up[k - 1], r_up[k - 1], F)
            k = model.parent[k]
            if k == 0:
                H = H.at[:6, 6 + j].set(F)
                H = H.at[6 + j, :6].set(F)
            else:
                jj = k - 1
                Sk = jnp.concatenate((model.joint_axis[jj], jnp.zeros(3)))
                val = Sk @ F
                H = H.at[6 + jj, 6 + j].set(val)
                H = H.at[6 + j, 6 + jj].set(val)
    return H


def cholesky_inverse(H):
    """Explicit H^{-1} for a batch of small SPD matrices via a fully
    unrolled Cholesky + triangular inversion.

    ``jax.scipy.linalg.cho_factor`` lowers to a LAPACK-style custom-call
    that is catastrophically slow for [B, 18, 18] batches on TPU (~8 ms per
    call measured on v5e). Unrolling over the static size n emits only
    plain batched einsums/elementwise ops that fuse, and the explicit
    inverse turns every downstream solve into one MXU matvec — the mass
    matrix is reused by the free-velocity solve and all contact-solver
    iterations, so inverting once wins.
    """
    n = H.shape[-1]
    batch = H.shape[:-2]
    cols = []          # columns of L, each [..., n]
    rows = []          # rows of L as [..., j+1] slices for the inversion
    for j in range(n):
        if j:
            Lj = jnp.stack([cols[k][..., j] for k in range(j)], axis=-1)
            s = H[..., :, j] - jnp.einsum(
                "...ik,...k->...i",
                jnp.stack(cols[:j], axis=-1), Lj,
            )
        else:
            s = H[..., :, j]
        inv_d = jax.lax.rsqrt(jnp.maximum(s[..., j], 1e-12))
        col = s * inv_d[..., None]
        # zero the upper part (rows < j)
        mask = jnp.arange(n) >= j
        col = col * mask
        cols.append(col)
    L = jnp.stack(cols, axis=-1)                       # [..., n, n] lower

    # X = L^{-1} by forward substitution, row by row (unrolled)
    xrows = []
    eye = jnp.eye(n, dtype=H.dtype)
    for i in range(n):
        if i:
            acc = jnp.einsum(
                "...k,...kj->...j",
                L[..., i, :i], jnp.stack(xrows, axis=-2),
            )
        else:
            acc = 0.0
        xi = (eye[i] - acc) / L[..., i, i][..., None]
        xrows.append(xi)
    X = jnp.stack(xrows, axis=-2)                      # [..., n, n] = L^{-1}
    return jnp.einsum("...ki,...kj->...ij", X, X)      # L^{-T} L^{-1}


def passive_torque(model: DynModel, qd_j):
    """URDF joint damping + smoothed dry friction (PhysX dof props)."""
    return -model.dof_damping * qd_j - model.dof_friction * jnp.tanh(qd_j / 0.1)


def forward_dynamics(
    model: DynModel,
    fk_out,
    v,
    tau_joint,
    f_ext,
    mass_scale,
):
    """qdd = H(q)^{-1} (tau - bias). Single env; vmap over the batch.

    Args:
      fk_out:    (R_w, p_w, (E_up, r_up), v_b) from :func:`fk`.
      tau_joint: [nj] actuation torques (already PD-computed and clipped).
      f_ext:     [nb, 6] external spatial forces in body coords (contacts).
      mass_scale: scalar base-mass DR factor.
    Returns qdd [nv].
    """
    bias = bias_forces(model, fk_out, v, f_ext, mass_scale)
    H = mass_matrix(model, fk_out, mass_scale)
    tau = jnp.concatenate(
        (jnp.zeros(6), tau_joint + passive_torque(model, v[6:]))
    )
    Hinv = cholesky_inverse(H)
    return Hinv @ (tau - bias)


def integrate(model: DynModel, base_pos, base_quat, joint_q, v, qdd, dt):
    """Semi-implicit Euler: v += dt*qdd, then positions with the *new*
    velocity (PhysX-style). Base angular velocity integrated on SO(3)."""
    v_new = v + dt * qdd
    R0 = tmath.quat_to_rotmat(base_quat)
    omega_w = R0 @ v_new[:3]
    vel_w = R0 @ v_new[3:6]
    base_pos_new = base_pos + dt * vel_w
    base_quat_new = tmath.quat_integrate(base_quat, omega_w, dt)
    joint_q_new = joint_q + dt * v_new[6:]
    return base_pos_new, base_quat_new, joint_q_new, v_new
