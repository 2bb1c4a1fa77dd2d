"""Fused control-step engine: PD torques + free dynamics + contact impulses.

Mirrors the reference's decimated inner loop (legged_robot.py:627-639):

    for _ in range(decimation):                # 200 Hz physics, 50 Hz policy
        torques = kp*(target - q) - kd*qd      # legged_robot.py:664
        clip(torques, ±torque_limits)          # legged_robot.py:671
        physx.simulate(dt)

as a single jittable, branch-free function over one env that the env layer
`vmap`s across the batch and `lax.scan`s across the rollout.

Substep pipeline (see physics/contact.py for the solver rationale):
  1. FK                         (poses + body velocities)
  2. tau = PD(target, q, qd)    (clipped to URDF effort limits)
  3. H = CRBA(q); chol(H)       (one factorization reused everywhere)
  4. v* = v + dt H^{-1}(tau-b)  (unconstrained/free velocity)
  5. impulse PGS                (normal + friction, Baumgarte bias)
  6. semi-implicit position update
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from unitree_rl_gym_tpu.physics import contact as ct
from unitree_rl_gym_tpu.physics import dynamics as dyn


class PhysicsState(struct.PyTreeNode):
    """Minimal per-env mechanical state (generalized coordinates)."""

    base_pos: jax.Array   # [3] world
    base_quat: jax.Array  # [4] xyzw
    joint_q: jax.Array    # [nj]
    v: jax.Array          # [nv] = [base ang(body); base lin(body); qd]


@dataclasses.dataclass(frozen=True)
class PDParams:
    """Per-joint PD controller constants (trace-time)."""

    kp: jnp.ndarray            # [nj]
    kd: jnp.ndarray            # [nj]
    torque_limit: jnp.ndarray  # [nj] URDF effort limits
    clip_torque: bool = True   # handstand env skips the clip
                               # (go2_handstand_env.py:326-350)


def control_step(
    model: dyn.DynModel,
    cparams: ct.ContactParams,
    pd: PDParams,
    sim_dt: float,
    decimation: int,
    state: PhysicsState,
    target_q,          # [nj] PD position target for this control step
    friction_env,      # scalar DR shape friction
    mass_scale,        # scalar DR base-mass factor
    m_eff_n,           # [ncp] contact preconditioner (build-time constant)
    m_eff_t,           # [ncp]
    ground_fn=None,    # terrain height lookup (None = z=0 plane)
    cstiff=None,       # scalar contact-stiffness DR scale (None = 1.0)
):
    """Advance one control step (= ``decimation`` physics substeps).

    Returns (new_state, aux) where aux carries everything the env layer
    needs from the *last* substep — matching the reference, which refreshes
    state/contact tensors after the loop (legged_robot.py:678-679):
      torques  [nj], cf_rb [nrb,3] world contact forces,
      rb_pos_w [nrb,3], rb_vel_w [nrb,3].
    """
    no_ext = jnp.zeros((model.nb, 6))

    def substep(carry, _):
        s, _tau, _cf = carry
        fk_out = dyn.fk(model, s.base_pos, s.base_quat, s.joint_q, s.v)
        R_w, p_w, (E_up, r_up), v_b = fk_out

        tau = pd.kp * (target_q - s.joint_q) - pd.kd * s.v[6:]
        if pd.clip_torque:
            tau = jnp.clip(tau, -pd.torque_limit, pd.torque_limit)

        bias = dyn.bias_forces(model, fk_out, s.v, no_ext, mass_scale)
        H = dyn.mass_matrix(model, fk_out, mass_scale)
        Hinv = dyn.cholesky_inverse(H)
        tau_gen = jnp.concatenate(
            (jnp.zeros(6), tau + dyn.passive_torque(model, s.v[6:]))
        )
        v_free = s.v + sim_dt * (Hinv @ (tau_gen - bias))

        v_new, cf_rb = ct.contact_solve(
            model, cparams, E_up, r_up, R_w, p_w, Hinv,
            v_free, m_eff_n, m_eff_t, friction_env, sim_dt,
            ground_fn=ground_fn,
            stiff_scale=1.0 if cstiff is None else cstiff,
        )
        # PhysX clamps joint velocities to the dof_props limit
        # (legged_robot.py:457-464 captures it from gym); required for
        # stability — without it contact impulses can pump unbounded qd.
        v_new = v_new.at[6:].set(
            jnp.clip(v_new[6:], -model.dof_vel_limit, model.dof_vel_limit)
        )
        # PhysX rigid-body velocity caps on the base (ContactParams doc):
        # prevents fp32 overflow -> NaN in diverging contact states.
        v_new = v_new.at[:3].set(
            jnp.clip(v_new[:3], -cparams.max_angular_velocity,
                     cparams.max_angular_velocity)
        )
        v_new = v_new.at[3:6].set(
            jnp.clip(v_new[3:6], -cparams.max_linear_velocity,
                     cparams.max_linear_velocity)
        )

        bp, bq, q, _ = dyn.integrate(
            model, s.base_pos, s.base_quat, s.joint_q, v_new, jnp.zeros_like(v_new), sim_dt
        )
        # hard joint limits (PhysX constraint ≈ projection): clamp q and
        # zero the velocity component driving into the limit
        q_c = jnp.clip(q, model.dof_lower, model.dof_upper)
        qd = v_new[6:]
        qd = jnp.where(q < model.dof_lower, jnp.maximum(qd, 0.0), qd)
        qd = jnp.where(q > model.dof_upper, jnp.minimum(qd, 0.0), qd)
        v_new = v_new.at[6:].set(qd)
        q = q_c
        new = PhysicsState(base_pos=bp, base_quat=bq, joint_q=q, v=v_new)
        # last-substep torques/contacts ride the carry (stacking per-substep
        # outputs just to take [-1] would write decimation x the data)
        return (new, tau, cf_rb), None

    init = (
        state,
        jnp.zeros((model.nj,)),
        jnp.zeros((model.rb_rot.shape[0], 3)),
    )
    (state, tau_last, cf_last), _ = jax.lax.scan(
        substep, init, None, length=decimation
    )
    # Post-loop refresh: recompute world kinematics of the settled state for
    # observation/reward building (legged_robot.py:678-690).
    R_w, p_w, _, v_b = dyn.fk(
        model, state.base_pos, state.base_quat, state.joint_q, state.v
    )
    rb_pos_w, rb_vel_w = rb_states(model, R_w, p_w, v_b)
    aux = {
        "torques": tau_last,
        "cf_rb": cf_last,
        "rb_pos_w": rb_pos_w,
        "rb_vel_w": rb_vel_w,
    }
    return state, aux


def rb_states(model: dyn.DynModel, R_w, p_w, v_b):
    """World position / linear velocity of every report body (the analogue
    of Isaac Gym's rigid_body_state_tensor slices used by the humanoid envs,
    g1_env.py:34-54)."""
    b = model.rb_dyn_idx
    Rb, pb, vb = R_w[b], p_w[b], v_b[b]
    pos = pb + jnp.einsum("rij,rj->ri", Rb, model.rb_pos)
    v_local = vb[:, 3:] + jnp.cross(vb[:, :3], model.rb_pos)
    vel = jnp.einsum("rij,rj->ri", Rb, v_local)
    return pos, vel
