"""Contact-stiffness DR plumbing (DomainRandCfg.randomize_contact_stiffness).

The per-env ``cstiff`` scale multiplies the contact solver's de-penetration
bias (physics/contact.py contact_solve; soa.contact_solve_s; the Pallas
kernel's optional ``cs`` operand). Checks:

  * cstiff=1 is exactly the cstiff=None program's physics (all backends)
  * cstiff != 1 changes the settled contact response monotonically
    (stiffer -> less penetration at rest)
  * the env samples cstiff iff the DR flag is on, and eval overrides
    keep it off
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.registry import task_registry
from unitree_rl_gym_tpu.physics import backend as pb

N = 8


def _env(stiff_dr: bool):
    cfg, _ = task_registry.get_cfgs("go2")
    cfg.env.num_envs = N
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_contact_stiffness = stiff_dr
    cfg.sim.backend = "soa"
    return task_registry.get_task_class("go2")(cfg)


def _step_phys(env, cstiff, backend="soa", steps=25):
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    phys = state.phys
    target = jnp.broadcast_to(env.default_dof_pos, (N, env.num_actions))
    fric = jnp.full((N,), 1.0)
    mass = jnp.ones((N,))

    @jax.jit
    def many(phys):
        def body(p, _):
            p, _aux = pb.control_step(
                env.robot.dyn, env.cparams, env.pd, env.cfg.sim.dt,
                env.cfg.control.decimation, p, target, fric, mass,
                env.m_eff_n, env.m_eff_t, backend=backend, cstiff=cstiff,
            )
            return p, None
        p, _ = jax.lax.scan(body, phys, None, length=steps)
        return p

    return many(phys)


def test_cstiff_ones_matches_none():
    env = _env(False)
    p_none = _step_phys(env, None)
    p_ones = _step_phys(env, jnp.ones((N,)))
    np.testing.assert_allclose(
        np.asarray(p_none.base_pos), np.asarray(p_ones.base_pos),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_none.v), np.asarray(p_ones.v), rtol=0, atol=1e-5
    )


def test_cstiff_changes_settled_height():
    """Stiffer de-penetration bias -> the robot settles less deep."""
    env = _env(False)
    soft = _step_phys(env, jnp.full((N,), 0.25))
    stiff = _step_phys(env, jnp.full((N,), 3.0))
    z_soft = float(np.mean(np.asarray(soft.base_pos)[:, 2]))
    z_stiff = float(np.mean(np.asarray(stiff.base_pos)[:, 2]))
    assert np.isfinite(z_soft) and np.isfinite(z_stiff)
    assert z_stiff > z_soft - 1e-4, (z_soft, z_stiff)


def test_pallas_interpret_parity_with_cstiff():
    """Pallas kernel (interpret mode) == SoA XLA with a cstiff operand."""
    env = _env(False)
    cs = jnp.linspace(0.5, 3.0, N)
    p_soa = _step_phys(env, cs, backend="soa", steps=5)
    import os

    os.environ["UTRL_PALLAS_INTERPRET"] = "1"
    try:
        p_pal = _step_phys(env, cs, backend="pallas", steps=5)
    finally:
        del os.environ["UTRL_PALLAS_INTERPRET"]
    np.testing.assert_allclose(
        np.asarray(p_soa.base_pos), np.asarray(p_pal.base_pos),
        rtol=2e-4, atol=2e-4,
    )


def test_env_samples_cstiff_iff_flag():
    env_on = _env(True)
    state, _ = env_on.reset_all(jax.random.PRNGKey(0))
    assert state.cstiff is not None
    cs = np.asarray(state.cstiff)
    lo, hi = env_on.cfg.domain_rand.contact_stiffness_range
    assert cs.shape == (N,) and (cs >= lo).all() and (cs <= hi).all()

    env_off = _env(False)
    state, _ = env_off.reset_all(jax.random.PRNGKey(0))
    assert state.cstiff is None
