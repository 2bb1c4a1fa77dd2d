"""Velocity-level impulse contact solver (batched PGS, TGS-lite).

Replaces PhysX's TGS LCP contact solve (reference sim params,
``legged_robot_config.py:231-242``) with a fixed-iteration projected
Gauss-Seidel impulse solver evaluated at the contact points extracted from
the URDF collision geometry (models/urdf.py). The structure maps exactly
onto TPU: a few batched [nv x nv] Cholesky solves (impulse distribution
through the articulated mass matrix) plus fused per-point VPU math — no
data-dependent branching, fixed shapes, `vmap`-able.

Design notes:
* Per-point impulses are computed with a *diagonal* effective-mass
  preconditioner (precomputed at env build from J H^{-1} J^T at the default
  pose, see :func:`point_effective_mass`); the coupling between points is
  handled by distributing accumulated impulse deltas through the exact
  mass matrix (one `cho_solve` per iteration) — so the solver converges like
  PGS without forming the full Delassus operator.
* Baumgarte stabilization pushes penetration out at ``beta*phi/dt`` capped
  by ``max_depenetration_velocity`` — the same knob PhysX exposes and the
  reference sets to 1.0 (legged_robot_config.py:239).
* Friction: accumulated tangential impulse clamped to the Coulomb cone of
  the accumulated normal impulse -> true stiction, unconditionally stable.
* Friction combine follows PhysX's default *average* mode: effective mu is
  the mean of terrain friction (cfg.terrain.static_friction) and the
  per-env domain-randomized shape friction (legged_robot.py:429-439).

Outputs per-report-body world contact forces — the analogue of Isaac Gym's
``net_contact_force_tensor`` (legged_robot.py:88,119) consumed by rewards
and terminations (>1N feet contact, termination contacts, ...).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from unitree_rl_gym_tpu.physics import dynamics as dyn


@dataclasses.dataclass(frozen=True)
class ContactParams:
    iterations: int = 8                      # 2x PhysX num_position_iterations
    baumgarte: float = 0.2                   # position-error gain
    max_depenetration_velocity: float = 1.0  # legged_robot_config.py:239
    terrain_friction: float = 1.0            # plane material friction
    restitution: float = 0.0
    relaxation: float = 1.0                  # SOR factor on impulse deltas
    # PhysX rigid-body velocity caps (asset options the reference sets to
    # 1000, legged_robot_config.py:141-142). Applied to the base every
    # substep: keeps a diverging contact state finite in fp32 (an
    # unbounded velocity reaches inf within a few steps and then the
    # friction-cone projection produces inf*0 = NaN, poisoning params).
    max_angular_velocity: float = 1000.0
    max_linear_velocity: float = 1000.0


def point_kinematics(model: dyn.DynModel, R_w, p_w, v_b):
    """World position and velocity of every contact point ([ncp,3] each)."""
    b = model.cp_dyn
    Rb, pb, vb = R_w[b], p_w[b], v_b[b]
    x = pb + jnp.einsum("cij,cj->ci", Rb, model.cp_pos)
    v_local = vb[:, 3:] + jnp.cross(vb[:, :3], model.cp_pos)
    v = jnp.einsum("cij,cj->ci", Rb, v_local)
    return x, v


def contact_solve(
    model: dyn.DynModel,
    params: ContactParams,
    E_up,
    r_up,
    R_w,
    p_w,
    Hinv,             # [nv, nv] explicit inverse mass matrix
    v,                # [nv] generalized velocity AFTER free dynamics
    m_eff_n,          # [ncp] normal-direction effective mass (preconditioner)
    m_eff_t,          # [ncp] tangential effective mass
    friction_env,     # scalar per-env DR shape friction
    dt: float,
    ground_fn=None,   # callable xy[...,2] -> ground height (None = z=0 plane)
    stiff_scale=1.0,  # per-env contact-stiffness DR scale on the
                      # de-penetration bias (DomainRandCfg.
                      # randomize_contact_stiffness)
):
    """Run the impulse solver; returns (v_new [nv], cf_rb [nrb,3])."""
    ncp = model.cp_pos.shape[0]
    nv = model.nv
    mu = 0.5 * (params.terrain_friction + friction_env)

    # contact geometry is frozen for the pass (positions don't change)
    x, _ = point_kinematics(model, R_w, p_w, dyn.velocity_prop(model, E_up, r_up, v))
    ground_height = ground_fn(x[:, :2]) if ground_fn is not None else 0.0
    phi = model.cp_radius + ground_height - x[:, 2]
    active = phi > 0.0
    v_bias = stiff_scale * jnp.minimum(
        params.baumgarte * jnp.maximum(phi, 0.0) / dt,
        params.max_depenetration_velocity,
    )

    # Point-velocity Jacobian A [ncp, 3, nv] built once per substep by
    # propagating the nv basis velocities through the (linear-in-v)
    # kinematics; every PGS iteration then reduces to two einsums and one
    # triangular solve instead of re-running the body recursions.
    def basis_point_vels(e):
        v_b = dyn.velocity_prop(model, E_up, r_up, e)
        _, v_pt = point_kinematics(model, R_w, p_w, v_b)
        return v_pt

    A = jnp.transpose(
        jax.vmap(basis_point_vels)(jnp.eye(nv)), (1, 2, 0)
    )  # [ncp, 3, nv]
    # Hoist everything loop-invariant out of the PGS scan: direction slices
    # of A (XLA otherwise re-slices the big array every iteration) and the
    # "response" matrices A H^{-1} that turn impulse application + velocity
    # refresh into plain matvecs.
    An = A[:, 2, :]                       # [ncp, nv] normal rows
    At = A[:, :2, :]                      # [ncp, 2, nv] tangent rows
    AHn = An @ Hinv                       # [ncp, nv]
    AHt = jnp.einsum("cdn,nm->cdm", At, Hinv)

    # Block-Jacobi scaling: all point deltas are applied simultaneously, so
    # points sharing a dynamic body would overshoot by their count. Scale
    # each delta by 1/#active-points-on-body (exact within a rigid body,
    # conservative across bodies). Segment reductions are phrased as
    # constant one-hot matmuls — vmapped scatters are poison on TPU.
    onehot_dyn = (
        model.cp_dyn[None, :] == jnp.arange(model.nb)[:, None]
    ).astype(jnp.float32)                                   # [nb, ncp]
    n_active = onehot_dyn @ active.astype(jnp.float32)
    jacobi = 1.0 / jnp.maximum(n_active[model.cp_dyn], 1.0)

    def iteration(carry, _):
        v, pn_acc, pt_acc = carry
        vn = An @ v                                    # [ncp]
        vt = jnp.einsum("cdn,n->cd", At, v)            # [ncp, 2]

        # normal: target velocity = +v_bias (de-penetration), accumulate >= 0
        dpn = params.relaxation * jacobi * m_eff_n * (v_bias - vn)
        pn_new = jnp.where(active, jnp.maximum(pn_acc + dpn, 0.0), 0.0)
        dpn = pn_new - pn_acc

        # tangential: drive vt -> 0, clamp to cone |pt| <= mu * pn
        dpt = -(params.relaxation * jacobi * m_eff_t)[:, None] * vt
        pt_new = pt_acc + jnp.where(active[:, None], dpt, 0.0)
        pt_norm = jnp.linalg.norm(pt_new, axis=-1)
        cone = mu * pn_new
        scale = jnp.where(pt_norm > cone, cone / (pt_norm + 1e-9), 1.0)
        pt_new = pt_new * scale[:, None]
        dpt = pt_new - pt_acc

        # dv = H^{-1} J^T dp via the precomputed response matrices
        dv = dpn @ AHn + jnp.einsum("cd,cdm->m", dpt, AHt)
        return (v + dv, pn_new, pt_new), None

    (v, pn, pt), _ = jax.lax.scan(
        iteration,
        (v, jnp.zeros(ncp), jnp.zeros((ncp, 2))),
        None,
        length=params.iterations,
    )

    # report: net world contact force per report body (impulse / dt)
    f_world = jnp.concatenate((pt, pn[:, None]), axis=-1) / dt
    onehot_rb = (
        model.cp_body[None, :] == jnp.arange(model.rb_rot.shape[0])[:, None]
    ).astype(jnp.float32)                                   # [nrb, ncp]
    cf_rb = jnp.einsum("rc,cd->rd", onehot_rb, f_world)
    return v, cf_rb


def point_effective_mass(model: dyn.DynModel, base_quat, base_pos, joint_q):
    """Diagonal effective masses 1/(J H^{-1} J^T) for each contact point in
    the world z (normal) and x/y (tangent, averaged) directions, evaluated
    at a nominal pose. Used to precondition the PGS solver; accuracy only
    affects convergence rate, not the fixed point."""
    nv = model.nv
    zero_v = jnp.zeros(nv)
    fk_out = dyn.fk(model, base_pos, base_quat, joint_q, zero_v)
    R_w, p_w, (E_up, r_up), _ = fk_out

    def point_vels(vbasis):
        v_b = dyn.velocity_prop(model, E_up, r_up, vbasis)
        _, v_pt = point_kinematics(model, R_w, p_w, v_b)
        return v_pt  # [ncp, 3]

    A = jax.vmap(point_vels)(jnp.eye(nv))          # [nv, ncp, 3]
    A = jnp.transpose(A, (1, 2, 0))                # [ncp, 3, nv]
    H = dyn.mass_matrix(model, fk_out, 1.0)
    Hinv = dyn.cholesky_inverse(H)
    Hib = jnp.einsum("cdn,nm->cdm", A, Hinv)       # [ncp, 3, nv]
    # per-point 3x3 Delassus diag blocks:
    D = jnp.einsum("cdn,cen->cde", A, Hib)         # [ncp, 3, 3]
    m_n = 1.0 / jnp.clip(D[:, 2, 2], 1e-6, None)
    m_t = 1.0 / jnp.clip(0.5 * (D[:, 0, 0] + D[:, 1, 1]), 1e-6, None)
    return m_n, m_t
