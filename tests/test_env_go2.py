"""Go2 env pipeline: shapes, determinism, reset semantics, reward sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg


@pytest.fixture(scope="module")
def env():
    cfg = go2_rough_cfg()
    cfg.env.num_envs = 8
    return LeggedEnv(cfg)


@pytest.fixture(scope="module")
def state_obs(env):
    return env.reset_all(jax.random.PRNGKey(0))


def test_reset_shapes(env, state_obs):
    state, obs = state_obs
    assert obs.shape == (8, 48)
    assert state.phys.joint_q.shape == (8, 12)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_step_shapes_and_finiteness(env, state_obs):
    state, _ = state_obs
    a = jnp.zeros((8, 12))
    state, obs, priv, rew, reset, extras = env.step(state, a)
    assert obs.shape == (8, 48)
    assert priv is None
    assert rew.shape == (8,)
    assert reset.dtype == jnp.bool_
    assert "time_outs" in extras
    assert np.all(np.isfinite(np.asarray(obs)))
    assert np.all(np.isfinite(np.asarray(rew)))


def test_extras_episode_schema(env, state_obs):
    """rsl_rl-compatible extras schema (legged_robot.py:758-768):
    extras["episode"]["rew_<term>"] per-term means and extras["time_outs"]."""
    state, _ = state_obs
    _, _, _, _, _, extras = env.step(state, jnp.zeros((8, 12)))
    assert "episode" in extras and "time_outs" in extras
    ep = extras["episode"]
    for name in env.episode_term_names:
        assert f"rew_{name}" in ep
        assert np.isfinite(float(ep[f"rew_{name}"]))
    assert extras["time_outs"].shape == (8,)


def test_fixed_seed_determinism(env):
    """BASELINE.json bit-consistency requirement: same seed, same traces."""
    s1, o1 = env.reset_all(jax.random.PRNGKey(42))
    s2, o2 = env.reset_all(jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    a = jnp.ones((8, 12)) * 0.1
    step = jax.jit(env.step)
    for _ in range(3):
        s1, o1, _, r1, d1, _ = step(s1, a)
        s2, o2, _, r2, d2, _ = step(s2, a)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_rollout_survives_and_rewards_flow(env):
    """Zero-action rollout: robot stands (PD holds default pose) and accrues
    finite rewards; a fraction of obs change every step (noise on)."""
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    total = jnp.zeros(8)
    for _ in range(50):
        state, obs, _, rew, reset, _ = step(state, jnp.zeros((8, 12)))
        total = total + rew
    assert np.all(np.isfinite(np.asarray(total)))
    # standing at default pose should not be terminating constantly
    assert float(jnp.mean(state.phys.base_pos[:, 2])) > 0.15


def test_termination_on_flip(env):
    """Flipping the base upside down must trigger the tip-over reset
    (legged_robot.py:718) and produce a fresh episode."""
    state, _ = env.reset_all(jax.random.PRNGKey(2))
    # flip base 180 deg about x: quat xyzw = (1,0,0,0)
    flipped = state.phys.replace(
        base_quat=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (8, 1))
    )
    state = state.replace(phys=flipped)
    state, obs, _, rew, reset, extras = env.step(state, jnp.zeros((8, 12)))
    assert bool(jnp.all(reset))
    # after fused reset the new state is upright again
    assert float(jnp.mean(state.phys.base_pos[:, 2])) > 0.3
    assert np.all(np.asarray(state.episode_length) == 0)


def test_command_resampling_zeroes_small(env):
    state, _ = env.reset_all(jax.random.PRNGKey(3))
    cmd = np.asarray(state.commands)
    norms = np.linalg.norm(cmd[:, :2], axis=1)
    assert np.all((norms > 0.2) | (norms == 0.0))


def test_reward_scales_pruned(env):
    # zero-scale terms are dropped (legged_robot.py:822-827)
    assert "orientation" not in env.reward_names  # scale -0. for go2
    assert "tracking_lin_vel" in env.reward_names
    assert "dof_pos_limits" in env.reward_names
    # scales multiplied by dt
    idx = env.reward_names.index("tracking_lin_vel")
    assert abs(env.reward_scales[idx] - 1.0 * env.dt) < 1e-9
