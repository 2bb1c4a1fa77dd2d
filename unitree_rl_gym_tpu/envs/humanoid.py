"""Humanoid envs (G1 / H1 / H1_2) — gait-phase extension of LeggedEnv.

Replicates the shared humanoid pattern of the reference
(g1_env.py / h1_env.py / h1_2_env.py): foot-state tracking from the rigid
body tensor, a 0.8 s gait phase clock with 0.5 L/R offset
(g1_env.py:86-95), sin/cos phase in the observation (g1_env.py:108-141),
a privileged critic observation that prepends the base linear velocity,
and the five humanoid reward terms (contact phase-match, swing height,
alive, contact-no-vel, hip pose).

Subclasses differ only in the hip dof indices penalized by
``_reward_hip_pos`` (g1_env.py:180 / h1_env.py:123 / h1_2_env.py:123)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unitree_rl_gym_tpu.envs import rewards as R
from unitree_rl_gym_tpu.envs.base_env import EnvState, LeggedEnv


class HumanoidEnv(LeggedEnv):
    HIP_IDX: Tuple[int, ...] = ()
    PHASE_PERIOD = 0.8       # g1_env.py:88
    PHASE_OFFSET = 0.5       # g1_env.py:89

    def __init__(self, cfg, robot=None):
        super().__init__(cfg, robot)
        self.hip_indices = jnp.asarray(self.HIP_IDX, jnp.int32)

    def _reward_registry(self):
        return R.HUMANOID_REWARDS

    def _noise_scale_vec(self) -> np.ndarray:
        """Humanoid layout: ang_vel, gravity, cmd, q, qd, a, sin/cos phase
        (g1_env.py:10-32)."""
        cfg = self.cfg
        na = self.num_actions
        ns = cfg.noise.noise_scales
        osc = cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        vec = np.zeros(self.num_obs, np.float32)
        vec[0:3] = ns["ang_vel"] * lvl * osc["ang_vel"]
        vec[3:6] = ns["gravity"] * lvl
        vec[6:9] = 0.0  # commands
        vec[9:9 + na] = ns["dof_pos"] * lvl * osc["dof_pos"]
        vec[9 + na:9 + 2 * na] = ns["dof_vel"] * lvl * osc["dof_vel"]
        vec[9 + 2 * na:9 + 3 * na] = 0.0  # previous actions
        vec[9 + 3 * na:9 + 3 * na + 2] = 0.0  # sin/cos phase
        return vec

    def _phase(self, episode_length):
        """Gait clock (g1_env.py:91-95)."""
        t = episode_length.astype(jnp.float32) * self.dt
        phase = jnp.mod(t, self.PHASE_PERIOD) / self.PHASE_PERIOD
        phase_left = phase
        phase_right = jnp.mod(phase + self.PHASE_OFFSET, 1.0)
        leg_phase = jnp.stack((phase_left, phase_right), axis=1)
        return phase, leg_phase

    def _callback(self, ctx, state: EnvState) -> EnvState:
        phase, leg_phase = self._phase(ctx.episode_length)
        ctx.phase = phase
        ctx.leg_phase = leg_phase
        return state

    def _extra_ctx(self, ctx, state: EnvState):
        ctx.hip_indices = self.hip_indices
        return ctx

    def _build_obs(self, ctx):
        """47(41)-dim obs + 50(44)-dim privileged obs (g1_env.py:108-141)."""
        osc = self.cfg.normalization.obs_scales
        sin_phase = jnp.sin(2 * jnp.pi * ctx.phase)[:, None]
        cos_phase = jnp.cos(2 * jnp.pi * ctx.phase)[:, None]
        common = (
            ctx.base_ang_vel * osc["ang_vel"],
            ctx.projected_gravity,
            ctx.commands[:, :3] * self.commands_scale,
            (ctx.dof_pos - self.default_dof_pos) * osc["dof_pos"],
            ctx.dof_vel * osc["dof_vel"],
            ctx.actions,
            sin_phase,
            cos_phase,
        )
        obs = jnp.concatenate(common, axis=-1)
        priv = jnp.concatenate(
            (ctx.base_lin_vel * osc["lin_vel"],) + common, axis=-1
        )
        return obs, priv


class G1Env(HumanoidEnv):
    HIP_IDX = (1, 2, 7, 8)       # g1_env.py:180 (hip roll/yaw both legs)


class H1Env(HumanoidEnv):
    HIP_IDX = (0, 1, 5, 6)       # h1_env.py:123


class H1_2Env(HumanoidEnv):
    HIP_IDX = (0, 2, 6, 8)       # h1_2_env.py:123
