"""Terrain: generators, height lookup, heightfield env integration,
terrain + command curricula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.utils.config import TerrainCfg
from unitree_rl_gym_tpu.utils.terrain import (
    SubTerrain, Terrain, gap_terrain, pit_terrain,
    pyramid_sloped_terrain, pyramid_stairs_terrain,
)


def small_cfg(**kw):
    cfg = TerrainCfg()
    cfg.mesh_type = "heightfield"
    cfg.num_rows = 2
    cfg.num_cols = 2
    cfg.terrain_length = 4.0
    cfg.terrain_width = 4.0
    cfg.border_size = 2.0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_generators_shapes_and_signs():
    t = SubTerrain(80, 80, 0.005, 0.1)
    pyramid_sloped_terrain(t, slope=0.2, platform_size=1.0)
    assert t.height_field_raw.max() > 0
    t2 = SubTerrain(80, 80, 0.005, 0.1)
    pyramid_stairs_terrain(t2, step_width=0.31, step_height=0.1,
                           platform_size=1.0)
    assert t2.height_field_raw.max() > 0
    t3 = SubTerrain(80, 80, 0.005, 0.1)
    pit_terrain(t3, depth=0.5, platform_size=1.0)
    assert t3.height_field_raw.min() < 0
    t4 = SubTerrain(80, 80, 0.005, 0.1)
    gap_terrain(t4, gap_size=0.5, platform_size=1.0)
    assert t4.height_field_raw.min() == -1000


def test_terrain_grid_and_lookup():
    cfg = small_cfg(curriculum=True)
    terr = Terrain(cfg, num_robots=4, seed=0)
    assert terr.height_field_raw.shape == (
        2 * 40 + 2 * 20, 2 * 40 + 2 * 20
    )
    grid = terr.grid()
    # origins sit on flat platforms: lookup at origin ~ origin z
    for i in range(2):
        for j in range(2):
            ox, oy, oz = terr.env_origins[i, j]
            h = float(grid.height_at(jnp.asarray([ox, oy])))
            assert abs(h - oz) < 0.06, (i, j, h, oz)
    # border is flat zero
    assert abs(float(grid.height_at(jnp.asarray([-1.0, -1.0])))) < 1e-6


def test_window_tracks_walking_env():
    """The block-aligned window fetch + in-window tent lookup must stay
    EXACTLY bilinear for contact points around an env that walks far
    beyond its original window span, when windows are re-centered every
    ``window_refresh_steps`` control steps (the PPO rollout's chunked
    cadence, rl/ppo.py). Pins the r4 correctness fix: the da7df41 16x16
    windows were fetched once per 24-step rollout, so a walking env got
    silently edge-clamped heights mid-rollout."""
    cfg = small_cfg(curriculum=True)
    terr = Terrain(cfg, num_robots=4, seed=0)
    grid = terr.grid()
    W, refresh_every = 24, 12
    dt, vx = 0.02, 1.5                         # push-cap-speed walk
    start = jnp.asarray(
        [[terr.env_origins[0, 0][0], terr.env_origins[0, 0][1]],
         [terr.env_origins[1, 1][0], terr.env_origins[1, 1][1]]]
    )
    # contact-point offsets around the base (worst-case ~0.4 m reach)
    offs = jnp.asarray(
        [[0.4, 0.0], [-0.4, 0.0], [0.0, 0.4], [0.0, -0.4], [0.3, -0.3]]
    )
    win = corner = None
    clamped_err_without_refresh = 0.0
    for t in range(48):
        base = start + jnp.asarray([vx * dt * t, 0.3 * dt * t])
        if t % refresh_every == 0:
            win, corner = grid.window_at(base, W=W)
            if t == 0:
                win0, corner0 = win, corner    # never-refreshed control
        pts = base[:, None, :] + offs[None]
        h_win = grid.height_in_window(win, corner, pts)
        h_ref = grid.height_at(pts)
        np.testing.assert_allclose(
            np.asarray(h_win), np.asarray(h_ref), atol=1e-6,
            err_msg=f"step {t}",
        )
        h_stale = grid.height_in_window(win0, corner0, pts)
        clamped_err_without_refresh = max(
            clamped_err_without_refresh,
            float(jnp.max(jnp.abs(h_stale - h_ref))),
        )
    # sanity that the refresh is load-bearing: the never-refreshed window
    # clamps and diverges over the same walk (otherwise this test would
    # pass vacuously on flat ground)
    assert clamped_err_without_refresh > 0.01, clamped_err_without_refresh


def test_env_on_heightfield_stands():
    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg

    cfg = go2_rough_cfg()
    cfg.env.num_envs = 4
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 6.0
    cfg.terrain.terrain_width = 6.0
    cfg.terrain.border_size = 5.0
    cfg.terrain.max_init_terrain_level = 1
    env = LeggedEnv(cfg)
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(obs)))
    step = jax.jit(env.step)
    for _ in range(25):
        state, obs, _, rew, reset, extras = step(
            state, jnp.zeros((4, 12))
        )
    # robots stand near their platform origin height
    rel = np.asarray(state.phys.base_pos[:, 2] - state.env_origin[:, 2])
    assert np.all(rel > 0.1) and np.all(rel < 0.5), rel
    assert "terrain_level_mean" in extras


def test_command_curriculum_expands():
    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg

    cfg = go2_rough_cfg()
    cfg.env.num_envs = 4
    cfg.commands.curriculum = True
    cfg.commands.max_curriculum = 2.0
    env = LeggedEnv(cfg)
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state.cmd_vx_range), [-1.0, 1.0])
    # inject a huge tracking episode sum and force a reset -> range widens
    idx = env.reward_names.index("tracking_lin_vel")
    sums = state.episode_sums.at[:, idx].set(1e6)
    flipped = state.phys.replace(
        base_quat=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (4, 1))
    )
    state = state.replace(episode_sums=sums, phys=flipped)
    state, *_, extras = env.step(state, jnp.zeros((4, 12)))
    np.testing.assert_allclose(
        np.asarray(state.cmd_vx_range), [-1.5, 1.5]
    )
    assert float(extras["max_command_x"]) == pytest.approx(1.5)
