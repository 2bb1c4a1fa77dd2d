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


def test_actuation_loop_dr(env):
    """r5 actuation-loop DR (DomainRandCfg.randomize_pd_gain /
    action_delay_prob): per-env proportional-gain scale + 1-step
    actuation delay, fixed at creation like the friction buckets.
    Off by default (fields None -> exact step program preserved)."""
    # default path: DR off, state carries no extra operands
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    assert state.pd_gain is None and state.act_delay is None

    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg

    cfg = go2_rough_cfg()
    cfg.env.num_envs = 4
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_pd_gain = True
    cfg.domain_rand.pd_gain_range = (0.7, 1.3)
    cfg.domain_rand.action_delay_prob = 0.5
    denv = LeggedEnv(cfg)
    state, _ = denv.reset_all(jax.random.PRNGKey(1))
    g = np.asarray(state.pd_gain)
    assert g.shape == (4,) and np.all((g >= 0.7) & (g <= 1.3))
    assert state.act_delay.shape == (4,)

    # behavioral check, delay: envs 0/1 identical state, env 1 delayed.
    # First step after reset the delayed env actuates the previous
    # (zero) action -> its joints track the big command strictly less.
    phys0 = jax.tree.map(lambda a: a.at[1].set(a[0]), state.phys)
    state = state.replace(
        phys=phys0,
        pd_gain=jnp.ones(4),
        act_delay=jnp.asarray([False, True, False, True]),
        actions=jnp.zeros((4, 12)),
    )
    big = jnp.ones((4, 12)) * 1.0
    s1, *_ = denv.step(state, big)
    dq = np.abs(np.asarray(s1.phys.joint_q - state.phys.joint_q))
    assert dq[0].sum() > 2.0 * dq[1].sum()
    # and the delayed env's obs still reports the COMMANDED action
    assert np.allclose(np.asarray(s1.actions[1]), np.asarray(big[1]))

    # behavioral check, gain: same state, gain 0.6 vs 1.4 -> the
    # low-gain env moves strictly less toward the same target
    state2 = state.replace(
        pd_gain=jnp.asarray([0.6, 1.4, 1.0, 1.0]),
        act_delay=jnp.zeros(4, bool),
    )
    s2, *_ = denv.step(state2, big)
    dq2 = np.abs(np.asarray(s2.phys.joint_q - state2.phys.joint_q))
    assert dq2[0].sum() < dq2[1].sum()
