"""Curriculum and mid-episode fault-injection policies, factored out of the
fused step as pure array functions (evaluated inside jit, no recompiles).

* Terrain curriculum — ETH legged_gym ``_update_terrain_curriculum``
  semantics (legged_robot.py: promote envs that crossed half the
  sub-terrain, demote envs that walked less than half of what the command
  asked for; graduates get a random row).
* Command curriculum — ``update_command_curriculum``
  (legged_robot.py:596-611): widen the vx range by 0.5 when the mean
  tracking reward of reset envs exceeds 80% of its maximum.
* Random pushes — ``_push_robots`` (legged_robot.py:540-555): overwrite
  the world-frame xy base velocity every ``push_interval`` steps.

All functions are mask-driven (evaluated every step, applied via
``jnp.where``) so they compose with the reset-in-step architecture.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unitree_rl_gym_tpu.utils import math as tm


def terrain_curriculum_at_reset(
    tcfg,
    terrain_origins,
    max_episode_length_s,
    key,
    reset_mask,
    base_pos,
    commands,
    terrain_level,
    terrain_type,
    env_origin,
):
    """New (terrain_level, env_origin) for envs being reset this step."""
    n = reset_mask.shape[0]
    dist = jnp.linalg.norm(base_pos[:, :2] - env_origin[:, :2], axis=1)
    move_up = dist > tcfg.terrain_length / 2.0
    move_down = (
        dist
        < jnp.linalg.norm(commands[:, :2], axis=1)
        * max_episode_length_s * 0.5
    ) & ~move_up
    new_level = terrain_level + move_up.astype(jnp.int32) - (
        move_down.astype(jnp.int32)
    )
    rand_level = jax.random.randint(key, (n,), 0, tcfg.num_rows)
    new_level = jnp.where(
        new_level >= tcfg.num_rows, rand_level,
        jnp.maximum(new_level, 0),
    )
    terrain_level = jnp.where(reset_mask, new_level, terrain_level)
    env_origin = jnp.where(
        reset_mask[:, None],
        terrain_origins[terrain_level, terrain_type],
        env_origin,
    )
    return terrain_level, env_origin


def command_curriculum_at_reset(
    max_curriculum,
    tracking_scale,
    max_episode_length,
    reset_mask,
    tracking_sums,
    cmd_vx_range,
):
    """Widened lin_vel_x command range when reset envs track well."""
    count = jnp.maximum(jnp.sum(reset_mask), 1)
    mean_track = (
        jnp.sum(jnp.where(reset_mask, tracking_sums, 0.0)) / count
    ) / max_episode_length
    grow = (mean_track > 0.8 * tracking_scale) & (jnp.sum(reset_mask) > 0)
    return jnp.where(
        grow,
        jnp.stack(
            (jnp.clip(cmd_vx_range[0] - 0.5, -max_curriculum, 0.0),
             jnp.clip(cmd_vx_range[1] + 0.5, 0.0, max_curriculum))
        ),
        cmd_vx_range,
    )


def push_robots(key, push_interval, max_push_vel_xy, episode_length, phys):
    """Base-velocity kick: overwrite world-frame vxy of envs whose episode
    clock hits the push interval; returns the updated physics state.

    The reference samples a velocity for every env but commits only the
    pushed ones (legged_robot.py:540-555 indexed write); this reproduces
    the committed behaviour."""
    n = episode_length.shape[0]
    push_mask = (episode_length % push_interval) == 0
    push_vxy = jax.random.uniform(
        key, (n, 2), minval=-max_push_vel_xy, maxval=max_push_vel_xy
    )
    R0 = tm.quat_to_rotmat(phys.base_quat)                     # [N,3,3]
    v_lin_w = jnp.einsum("nij,nj->ni", R0, phys.v[:, 3:6])
    v_xy = jnp.where(push_mask[:, None], push_vxy, v_lin_w[:, :2])
    v_lin_w = jnp.concatenate((v_xy, v_lin_w[:, 2:]), axis=1)
    v_lin_b = jnp.einsum("nji,nj->ni", R0, v_lin_w)
    return phys.replace(v=phys.v.at[:, 3:6].set(v_lin_b))
