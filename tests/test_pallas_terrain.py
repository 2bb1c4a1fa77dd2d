"""Terrain on the Pallas fast path: the frozen-per-control-step height
formulation (backend.sample_point_heights + gh operand in pallas_step.py)
must match the SoA reference that resamples the heightfield every substep.

decimation=1: exactly one substep, so frozen-per-step == per-substep and
the two backends must agree to fp tolerance. decimation=4: heights are up
to 15 ms stale, so parity is distributional (loose tolerance) — the error
budget for the fast path's staleness approximation is pinned here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg
from unitree_rl_gym_tpu.physics import backend as pb
from unitree_rl_gym_tpu.physics import engine as eng
from unitree_rl_gym_tpu.physics import pallas_step
from unitree_rl_gym_tpu.utils import math as tm

N = 8


@pytest.fixture(scope="module")
def terrain_env():
    cfg = go2_rough_cfg()
    cfg.env.num_envs = N
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 4.0
    cfg.terrain.border_size = 2.0
    cfg.terrain.curriculum = True
    return LeggedEnv(cfg)


def _states(env, key=0):
    nj = env.robot.num_dof
    origins = np.asarray(env.terrain_origins).reshape(-1, 3)
    base = np.zeros((N, 3), np.float32)
    for i in range(N):
        ox, oy, oz = origins[i % origins.shape[0]]
        base[i] = (ox + 0.2 * (i % 3 - 1), oy + 0.15 * (i % 2), oz + 0.32)
    phys = eng.PhysicsState(
        base_pos=jnp.asarray(base),
        base_quat=jnp.tile(tm.quat_identity(), (N, 1)),
        joint_q=jnp.tile(env.default_dof_pos, (N, 1))
        * (1 + 0.05 * jax.random.normal(jax.random.PRNGKey(key), (N, nj))),
        v=0.1 * jax.random.normal(jax.random.PRNGKey(key + 2), (N, 6 + nj)),
    )
    tgt = jnp.tile(env.default_dof_pos, (N, 1))
    fric = jnp.linspace(0.3, 1.2, N)
    mass = jnp.linspace(0.9, 1.3, N)
    return phys, tgt, fric, mass


def _run_both(env, decimation):
    cfg = env.cfg
    phys, tgt, fric, mass = _states(env)
    common = (
        env.robot.dyn, env.cparams, env.pd, cfg.sim.dt, decimation,
        phys, tgt, fric, mass, env.m_eff_n, env.m_eff_t,
    )
    s_soa, a_soa = pb.control_step_soa(*common, ground_fn=env.ground_fn)
    gh = pb.sample_point_heights(env.robot.dyn, phys, env.ground_fn)
    s_pal, a_pal = pallas_step.control_step_pallas(
        *common, interpret=True, gh=gh
    )
    return s_soa, a_soa, s_pal, a_pal, gh


def test_sampled_heights_nonzero_on_terrain(terrain_env):
    env = terrain_env
    phys, *_ = _states(env)
    gh = pb.sample_point_heights(env.robot.dyn, phys, env.ground_fn)
    m = pb.soa_model_for(env.robot.dyn)
    assert gh.shape == (m.ncp, N)   # row-layout contract (r5)
    assert np.all(np.isfinite(np.asarray(gh)))
    # envs stand on raised sub-terrain platforms -> some heights > 0
    assert float(jnp.max(jnp.abs(gh))) > 0.01


def test_pallas_terrain_exact_parity_single_substep(terrain_env):
    """decimation=1: frozen == per-substep sampling; backends must agree."""
    s_soa, a_soa, s_pal, a_pal, _ = _run_both(terrain_env, decimation=1)
    for name in ("base_pos", "base_quat", "joint_q", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_soa, name)),
            np.asarray(getattr(s_pal, name)),
            atol=5e-5, rtol=1e-4, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(a_soa["cf_rb"]), np.asarray(a_pal["cf_rb"]),
        atol=2e-3, rtol=1e-3,
    )


def test_pallas_terrain_close_parity_full_decimation(terrain_env):
    """decimation=4: staleness error must stay within the soft-contact
    regime (mm-scale positions, small velocity deltas)."""
    s_soa, _, s_pal, _, _ = _run_both(terrain_env, decimation=4)
    np.testing.assert_allclose(
        np.asarray(s_soa.base_pos), np.asarray(s_pal.base_pos),
        atol=5e-3, rtol=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(s_soa.joint_q), np.asarray(s_pal.joint_q),
        atol=2e-2, rtol=0.0,
    )
    assert np.all(np.isfinite(np.asarray(s_pal.v)))


def test_env_step_on_terrain_with_forced_pallas(terrain_env):
    """Whole env.step through the Pallas terrain path (interpret mode):
    finite obs/rewards and standing-height plausibility over the terrain."""
    env = terrain_env
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    import os
    os.environ["UTRL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = env.cfg
        gh = pb.sample_point_heights(
            env.robot.dyn, state.phys, env.ground_fn
        )
        s_pal, a_pal = pallas_step.control_step_pallas(
            env.robot.dyn, env.cparams, env.pd, cfg.sim.dt,
            cfg.control.decimation, state.phys,
            jnp.tile(env.default_dof_pos, (N, 1)),
            state.friction, state.mass_scale, env.m_eff_n, env.m_eff_t,
            gh=gh,
        )
    finally:
        del os.environ["UTRL_PALLAS_INTERPRET"]
    ground = np.asarray(env.ground_fn(state.phys.base_pos[:, :2]))
    rel_h = np.asarray(s_pal.base_pos[:, 2]) - ground
    assert np.all(np.isfinite(np.asarray(s_pal.base_pos)))
    assert (rel_h > 0.1).all() and (rel_h < 0.6).all()


def test_gh_carry_matches_fresh_sampling(terrain_env):
    """The env's lag-1 gh carry (built from aux["p_xy"]) must equal a
    fresh sample_point_heights at the NEXT step's start state for every
    env that did not reset — end-of-step-k positions are start-of-step-k+1
    positions, so the carry is lag-free by construction."""
    env = terrain_env
    state, _ = env.reset_all(jax.random.PRNGKey(3))
    assert state.gh is not None and state.gh.shape[0] > 0
    assert state.gh.shape[1] == N               # row-layout contract (r5)
    step = jax.jit(env.step)
    state2, _, _, _, reset, _ = step(
        state, jnp.zeros((N, env.num_actions))
    )
    fresh = pb.sample_point_heights(
        env.robot.dyn, state2.phys, env.ground_fn
    )
    live = ~np.asarray(reset)
    assert live.any()
    np.testing.assert_allclose(
        np.asarray(state2.gh)[:, live], np.asarray(fresh)[:, live],
        atol=1e-5,
    )
