"""Humanoid (G1/H1/H1_2) and handstand env pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.g1 import g1_rough_cfg
from unitree_rl_gym_tpu.envs.go2_handstand import (
    GO2HandstandEnv, go2_handstand_cfg,
)
from unitree_rl_gym_tpu.envs.h1 import h1_rough_cfg
from unitree_rl_gym_tpu.envs.h1_2 import h1_2_rough_cfg
from unitree_rl_gym_tpu.envs.humanoid import G1Env, H1Env, H1_2Env


@pytest.mark.parametrize(
    "env_cls,cfg_fn,n_obs,n_priv,n_act",
    [
        (G1Env, g1_rough_cfg, 47, 50, 12),
        (H1Env, h1_rough_cfg, 41, 44, 10),
        (H1_2Env, h1_2_rough_cfg, 47, 50, 12),
    ],
)
def test_humanoid_shapes_and_step(env_cls, cfg_fn, n_obs, n_priv, n_act):
    cfg = cfg_fn()
    cfg.env.num_envs = 4
    env = env_cls(cfg)
    assert env.num_obs == n_obs and env.num_privileged_obs == n_priv
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    assert obs.shape == (4, n_obs)
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, priv, rew, done, extras = step(
            state, jnp.zeros((4, n_act))
        )
    assert priv.shape == (4, n_priv)
    assert np.all(np.isfinite(np.asarray(obs)))
    assert np.all(np.isfinite(np.asarray(rew)))
    # sin/cos phase occupy the last two obs dims and stay on the unit circle
    sincos = np.asarray(obs[:, -2:])
    r = np.sqrt((sincos**2).sum(-1))
    assert np.all(np.abs(r - 1.0) < 0.35)  # noise-free dims + obs clip margin


def test_humanoid_phase_clock():
    cfg = g1_rough_cfg()
    cfg.env.num_envs = 2
    env = G1Env(cfg)
    # phase period 0.8 s, dt 0.02 -> 40 steps per cycle; offset 0.5 L/R
    phase, leg_phase = env._phase(jnp.asarray([0, 20]))
    np.testing.assert_allclose(np.asarray(phase), [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(leg_phase), [[0.0, 0.5], [0.5, 0.0]], atol=1e-6
    )


def test_humanoid_priv_obs_prepends_lin_vel():
    cfg = g1_rough_cfg()
    cfg.env.num_envs = 2
    cfg.noise.add_noise = False
    env = G1Env(cfg)
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    priv = state.priv_obs
    np.testing.assert_allclose(
        np.asarray(priv[:, 3:]), np.asarray(obs), atol=1e-6
    )


def test_handstand_env():
    cfg = go2_handstand_cfg()
    cfg.env.num_envs = 4
    env = GO2HandstandEnv(cfg)
    assert env.num_obs == 46
    assert not env.pd.clip_torque            # go2_handstand_env.py:326-350
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    assert obs.shape == (4, 46)
    # contact flags are binary
    flags = np.asarray(obs[:, -4:])
    assert set(np.unique(flags)).issubset({0.0, 1.0})
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, priv, rew, done, extras = step(
            state, jnp.zeros((4, 12))
        )
    assert np.all(np.isfinite(np.asarray(rew)))
    # only_positive_rewards is off: negative totals allowed
    assert env.cfg.rewards.only_positive_rewards is False


def test_handstand_rear_target_clamp():
    cfg = go2_handstand_cfg()
    cfg.env.num_envs = 2
    env = GO2HandstandEnv(cfg)
    big = jnp.ones((2, 12)) * 50.0
    target = env._compute_target(big)
    rear = np.asarray(target[:, env.rear_dof_idx])
    center = np.asarray(env.rear_center)
    assert np.all(rear <= center + 0.15 + 1e-6)
    front = np.asarray(target[:, env.front_dof_idx])
    assert np.all(front > 1.0)  # unclamped (action_scale 0.3 * 50)


def test_handstand_entry_lean_reward():
    """rewards.entry_lean: monotone planted-pivot ramp for the kick-up
    entry (r5 shaping, no reference analog). Pays increasing reward
    along the planted-lean path, ~0 for the ground-level dive-flip
    (high inversion at base ~0.18 m, the r5 arrival diagnostics'
    failure mode) and 0 upright."""
    import types

    from unitree_rl_gym_tpu.envs import rewards as R

    def ctx(gz, h, front_fz):
        n = len(gz)
        cf = np.zeros((n, 6, 3), np.float32)
        cf[:, 0, 2] = front_fz
        cf[:, 1, 2] = front_fz
        return types.SimpleNamespace(
            projected_gravity=jnp.asarray(
                np.stack(
                    [np.sqrt(np.clip(1 - np.square(gz), 0, 1)),
                     np.zeros(n), np.asarray(gz, np.float32)], axis=-1
                )
            ),
            base_pos=jnp.asarray(
                np.stack([np.zeros(n), np.zeros(n),
                          np.asarray(h, np.float32)], axis=-1)
            ),
            contact_forces=jnp.asarray(cf),
            front_feet_indices=jnp.asarray([0, 1]),
        )

    # planted path upright -> lean -> inverted band: strictly increasing
    gz_path = [-1.0, -0.95, -0.77, -0.5, 0.0, 0.26]   # th 0..105 deg
    h_path = [0.28, 0.27, 0.26, 0.30, 0.39, 0.52]      # FK mid-table
    pay = np.asarray(R.entry_lean(ctx(gz_path, h_path, 50.0)))
    assert pay[0] < 1e-3                                # upright: no pay
    assert np.all(np.diff(pay) > 0.0)                   # monotone ramp
    assert pay[1] > 0.15    # arccos-steep: 18 deg lean already pays
    # dive-flip: near-perfect inversion at ground level earns ~nothing
    dive = np.asarray(R.entry_lean(ctx([0.98], [0.18], 50.0)))
    assert dive[0] < 0.05
    # same lean without front-feet load: no pay (airborne doesn't count)
    air = np.asarray(R.entry_lean(ctx([-0.5], [0.30], 0.0)))
    assert air[0] < 1e-6


def test_handstand_pre_inversion_crouch_penalty():
    """rewards.pre_inversion_crouch (r5 dive-morphing shaping, negative
    scale): pays (as a penalty magnitude) only for a LOW base in the
    transition region — the dive-flip's signature — not for upright
    idle, the hold band, or the tall planted pivot path."""
    import types

    from unitree_rl_gym_tpu.envs import rewards as R

    def ctx(gz, h):
        n = len(gz)
        return types.SimpleNamespace(
            projected_gravity=jnp.asarray(
                np.stack([np.zeros(n), np.zeros(n),
                          np.asarray(gz, np.float32)], axis=-1)
            ),
            base_pos=jnp.asarray(
                np.stack([np.zeros(n), np.zeros(n),
                          np.asarray(h, np.float32)], axis=-1)
            ),
        )

    #                 dive-mid  upright  hold   tall-pivot  lying-flat
    pay = np.asarray(R.pre_inversion_crouch(
        ctx([0.0,      -1.0,    0.30,   0.0,        -1.0],
            [0.17,      0.28,   0.50,   0.39,        0.10])
    ))
    assert pay[0] > 0.03          # the dive sweep is penalized
    assert pay[1] < 1e-3          # upright idle: no pay (height fine)
    assert pay[2] < 1e-3          # hold band: gated out (g_z > 0.15)
    assert pay[3] < 1e-3          # legit pivot at height: no depth
    assert pay[4] < 0.01          # fallen upright-ish: gated out


def test_handstand_termination_not_inverted():
    cfg = go2_handstand_cfg()
    cfg.env.num_envs = 4
    env = GO2HandstandEnv(cfg)
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    # "fallen" check is on the sideways band (-0.2 < g_z < 0.2), gated
    # behind a grace period (fallen_grace_s, default 1 s) that legalises
    # the kick-up transition. Sideways AFTER the grace -> terminate;
    # sideways DURING the grace -> survive.
    import unitree_rl_gym_tpu.utils.math as tm

    q_side = tm.quat_from_euler_xyz(
        jnp.full((4,), jnp.pi / 2), jnp.zeros(4), jnp.zeros(4)
    )
    state = state.replace(
        phys=state.phys.replace(
            base_quat=q_side,
            base_pos=state.phys.base_pos.at[:, 2].set(1.0),
        ),
        episode_length=jnp.full_like(state.episode_length, 200),
    )
    _, _, _, _, reset, _ = env.step(state, jnp.zeros((4, 12)))
    assert bool(jnp.all(reset))

    early = state.replace(
        episode_length=jnp.zeros_like(state.episode_length)
    )
    _, _, _, _, reset_early, _ = env.step(early, jnp.zeros((4, 12)))
    assert not bool(jnp.any(reset_early))
