"""Physics-core invariants: free fall, momentum & energy conservation,
settling under contact. These validate the Featherstone CRBA/RNEA pipeline
end-to-end without any reference engine in the loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.models.robot import build_robot
from unitree_rl_gym_tpu.physics import contact as ct
from unitree_rl_gym_tpu.physics import dynamics as dyn
from unitree_rl_gym_tpu.physics import engine as eng
from unitree_rl_gym_tpu.utils import math as tm

from unitree_rl_gym_tpu import resource
GO2 = resource("resources/robots/go2/urdf/go2.urdf")

DEFAULT_Q = {
    "FL_hip_joint": 0.1, "RL_hip_joint": 0.1,
    "FR_hip_joint": -0.1, "RR_hip_joint": -0.1,
    "FL_thigh_joint": 0.8, "RL_thigh_joint": 1.0,
    "FR_thigh_joint": 0.8, "RR_thigh_joint": 1.0,
    "FL_calf_joint": -1.5, "RL_calf_joint": -1.5,
    "FR_calf_joint": -1.5, "RR_calf_joint": -1.5,
}


@pytest.fixture(scope="module")
def robot():
    return build_robot(GO2)


def make_state(robot, z=0.42, joint_q=None, v=None):
    nj = robot.num_dof
    return eng.PhysicsState(
        base_pos=jnp.asarray([0.0, 0.0, z]),
        base_quat=tm.quat_identity(),
        joint_q=jnp.zeros(nj) if joint_q is None else jnp.asarray(joint_q),
        v=jnp.zeros(6 + nj) if v is None else jnp.asarray(v),
    )


def no_ext(model):
    return jnp.zeros((model.nb, 6))


def test_free_fall(robot):
    """No contact, no torque: base CoM accelerates at -g."""
    model = robot.dyn
    s = make_state(robot, z=10.0)
    fk_out = dyn.fk(model, s.base_pos, s.base_quat, s.joint_q, s.v)
    qdd = dyn.forward_dynamics(
        model, fk_out, s.v, jnp.zeros(model.nj), no_ext(model), 1.0
    )
    # base linear acceleration (body frame == world here): z component = -g
    np.testing.assert_allclose(np.asarray(qdd[3:6]), [0, 0, -9.81], atol=1e-4)
    # joints feel no torque in uniform gravity with zero velocity... not true
    # in general (gravity acts at CoM), but angular base accel must be finite
    assert np.all(np.isfinite(np.asarray(qdd)))


def _total_energy_and_momentum(model, s):
    R_w, p_w, _, v_b = dyn.fk(model, s.base_pos, s.base_quat, s.joint_q, s.v)
    ke = 0.0
    pe = 0.0
    mom = jnp.zeros(3)
    for i in range(model.nb):
        Iv = model.I_sp[i] @ v_b[i]
        ke = ke + 0.5 * jnp.dot(v_b[i], Iv)
        m = model.I_sp[i][5, 5]
        com = (
            jnp.asarray(
                [model.I_sp[i][2, 4], model.I_sp[i][0, 5], model.I_sp[i][1, 3]]
            )
            / m
        )  # extract m*c from the inertia's coupling block
        com_w = p_w[i] + R_w[i] @ com
        pe = pe - m * jnp.dot(model.gravity, com_w)
        mom = mom + R_w[i] @ Iv[3:]
    return float(ke), float(pe), np.asarray(mom)


def step_passive(model, s, dt, gravity_on=True):
    g_save = model.gravity
    fk_out = dyn.fk(model, s.base_pos, s.base_quat, s.joint_q, s.v)
    qdd = dyn.forward_dynamics(
        model, fk_out, s.v, jnp.zeros(model.nj), no_ext(model), 1.0
    )
    bp, bq, q, v = dyn.integrate(
        model, s.base_pos, s.base_quat, s.joint_q, s.v, qdd, dt
    )
    return eng.PhysicsState(base_pos=bp, base_quat=bq, joint_q=q, v=v)


def test_energy_conservation_passive_swing(robot):
    """Floating robot tumbling in gravity, no contact: E = KE + PE drifts
    slowly (symplectic Euler) — bound the drift over 2000 steps @ 1 kHz."""
    model = robot.dyn
    rng = np.random.RandomState(0)
    v0 = np.concatenate([rng.uniform(-1, 1, 6) * 0.5, rng.uniform(-2, 2, 12)])
    s = make_state(robot, z=100.0, joint_q=np.zeros(12), v=v0)
    dt = 1e-3

    @jax.jit
    def roll(s):
        def body(s, _):
            fk_out = dyn.fk(model, s.base_pos, s.base_quat, s.joint_q, s.v)
            qdd = dyn.forward_dynamics(
                model, fk_out, s.v, jnp.zeros(model.nj), no_ext(model), 1.0
            )
            bp, bq, q, v = dyn.integrate(
                model, s.base_pos, s.base_quat, s.joint_q, s.v, qdd, dt
            )
            return eng.PhysicsState(bp, bq, q, v), None

        return jax.lax.scan(body, s, None, length=2000)[0]

    e0, p0, _ = _total_energy_and_momentum(model, s)
    s_end = roll(s)
    e1, p1, _ = _total_energy_and_momentum(model, s_end)
    drift = abs((e1 + p1) - (e0 + p0)) / max(abs(e0 + p0), 1.0)
    assert np.isfinite(drift)
    assert drift < 0.05, f"energy drift {drift:.4f}"


def test_linear_momentum_conservation_no_gravity(robot):
    """Zero gravity, no contact, zero torques: world linear momentum of the
    whole mechanism is exactly conserved by the dynamics."""
    import dataclasses

    model = dataclasses.replace(robot.dyn, gravity=jnp.zeros(3))
    rng = np.random.RandomState(1)
    v0 = np.concatenate([rng.uniform(-1, 1, 6), rng.uniform(-3, 3, 12)])
    q0 = rng.uniform(-0.5, 0.5, 12)
    s = make_state(robot, z=5.0, joint_q=q0, v=v0)
    _, _, mom0 = _total_energy_and_momentum(model, s)
    dt = 1e-3
    for _ in range(200):
        s = step_passive(model, s, dt)
    _, _, mom1 = _total_energy_and_momentum(model, s)
    np.testing.assert_allclose(mom1, mom0, atol=2e-3 * max(1.0, np.abs(mom0).max()))


def test_standing_settles_under_pd(robot):
    """Drop at default pose with PD hold: robot must settle upright at a
    plausible height with all four feet in contact (the reference's implicit
    'play' sanity check)."""
    model = robot.dyn
    default = robot.default_dof_pos(DEFAULT_Q)
    kp, kd = robot.pd_gains({"joint": 20.0}, {"joint": 0.5})
    pd = eng.PDParams(
        kp=jnp.asarray(kp),
        kd=jnp.asarray(kd),
        torque_limit=jnp.asarray(robot.dof_effort),
    )
    cparams = ct.ContactParams()
    s = make_state(robot, z=0.45, joint_q=default)
    target = jnp.asarray(default)
    m_eff_n, m_eff_t = ct.point_effective_mass(
        model, tm.quat_identity(), jnp.asarray([0.0, 0.0, 0.42]),
        jnp.asarray(default),
    )

    @jax.jit
    def run(s):
        def body(s, _):
            s, aux = eng.control_step(
                model, cparams, pd, 0.005, 4, s, target, 1.0, 1.0,
                m_eff_n, m_eff_t,
            )
            return s, aux

        return jax.lax.scan(body, s, None, length=100)

    s_end, aux = run(s)
    z = float(s_end.base_pos[2])
    assert 0.2 < z < 0.45, f"settled height {z}"
    # orientation stays upright
    g_proj = tm.quat_rotate_inverse(
        s_end.base_quat, jnp.asarray([0.0, 0.0, -1.0])
    )
    assert float(g_proj[2]) < -0.95
    # feet carry the weight: total normal force ≈ m g
    feet = robot.body_indices(["foot"])
    fz = float(np.asarray(aux["cf_rb"][-1])[feet, 2].sum())
    total_weight = float(robot.parsed.mass.sum()) * 9.81
    assert abs(fz - total_weight) / total_weight < 0.3, (fz, total_weight)
    # velocities nearly zero
    assert float(jnp.abs(s_end.v).max()) < 0.5
