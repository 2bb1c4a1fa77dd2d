"""LeggedEnv — pure-functional vectorized environment core.

TPU-native replacement for the reference's ``BaseTask``/``LeggedRobot``
stateful env (legged_gym/envs/base/{base_task,legged_robot}.py). The entire
per-control-step pipeline of the reference (SURVEY.md §3.2) — decimated PD
physics, command resampling + heading controller, termination, reward
engine, fused ``where``-masked resets, pushes, observation building with
noise — is one pure function

    step(state, actions) -> (state, obs, priv_obs, rew, reset, extras)

with no host synchronization: `vmap` over envs inside, `lax.scan`-able over
rollout steps, shardable over a device mesh along the env axis.

Pipeline order is kept exactly as the reference's ``post_physics_step``
(legged_robot.py:615-709): resample-commands *before* rewards, resets
*after* rewards, pushes *after* resets, observations last.

Numeric contracts preserved (the portable spec):
  * PD torque law + URDF effort clipping   legged_robot.py:649-671
  * obs layout / scales / clipping         legged_robot.py:789-811, 643-646
  * noise vector layout                    legged_robot.py:188-219
  * reward definitions & dt scaling        legged_robot.py:817-939
  * termination: contact>1N, |pitch|>1.0,
    |roll|>0.8, timeout                    legged_robot.py:711-721
  * reset distributions: dof U(0.5,1.5)x
    default, root vel U(-0.5,0.5)          legged_robot.py:557-594
  * command resampling + small-cmd zeroing legged_robot.py:519-538
  * heading P-controller                   legged_robot.py:513-516
  * push = overwrite world vxy             legged_robot.py:540-555
  * DR: 64 friction buckets, base mass     legged_robot.py:429-439, 472-483
  * extras schema (episode sums, timeouts) legged_robot.py:758-768
"""

from __future__ import annotations

import types
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unitree_rl_gym_tpu.envs import curricula
from unitree_rl_gym_tpu.envs import rewards as R
from unitree_rl_gym_tpu.models.robot import Robot, build_robot
from unitree_rl_gym_tpu.physics import contact as ct
from unitree_rl_gym_tpu.physics import engine as eng
from unitree_rl_gym_tpu.utils import math as tm
from unitree_rl_gym_tpu.utils.config import LeggedRobotCfg
from unitree_rl_gym_tpu import resource


class EnvState(struct.PyTreeNode):
    """Complete batched environment state (everything that evolves)."""

    phys: eng.PhysicsState          # [N, ...]
    episode_length: jax.Array       # [N] int32
    commands: jax.Array             # [N, 4]
    actions: jax.Array              # [N, na]
    last_actions: jax.Array         # [N, na]
    last_dof_vel: jax.Array         # [N, nj]
    feet_air_time: jax.Array        # [N, nf]
    last_contacts: jax.Array        # [N, nf] bool
    friction: jax.Array             # [N] DR shape friction
    mass_scale: jax.Array           # [N] DR base-mass factor
    episode_sums: jax.Array         # [N, n_terms]
    env_origin: jax.Array           # [N, 3] spawn origin (terrain platform)
    terrain_level: jax.Array        # [N] int32 (curriculum row; 0 on plane)
    terrain_type: jax.Array         # [N] int32 (terrain column; 0 on plane)
    cmd_vx_range: jax.Array         # [2] live lin_vel_x range (command curric.)
    obs: jax.Array                  # [N, num_obs]
    priv_obs: Optional[jax.Array]   # [N, num_priv] or None
    key: jax.Array                  # PRNG key
    # terrain only: step-start per-contact-point ground heights in ROW
    # layout [ncp, N] (the backends' native tile/SoA layout — r5: the
    # [N, ncp] contract paid two full transposes per control step,
    # doc/profile_r5.md), computed from the PREVIOUS step's end-of-step
    # point xy (aux["p_xy"], [2*ncp, N] rows) — end-of-step-k positions
    # ARE start-of-step-k+1 positions, so this carry is exactly as fresh
    # as re-sampling at step start but needs neither an XLA FK nor an
    # in-scan heightfield gather (both r2/r3 terrain bottlenecks; see
    # win/win_corner below).
    gh: Optional[jax.Array] = None
    # terrain only: per-env heightfield windows [N, W, W] + their grid
    # corners [N, 2]. Gathering from the global heightfield inside the
    # rollout lax.scan hits a serialized ~10 ns/element XLA:TPU path
    # (r3 profile: 82% of the terrain iteration), so windows are fetched
    # at top level (refresh_terrain, once per rollout) and heights come
    # from a tent-weight einsum against the window in-scan.
    win: Optional[jax.Array] = None
    win_corner: Optional[jax.Array] = None
    # envs reset since the last window refresh (teleported out of their
    # window): their gh falls back to the spawn platform height
    # env_origin[2] until refresh_terrain re-centers their window.
    win_stale: Optional[jax.Array] = None
    # task-specific evolving scalar/array state (None for base tasks).
    # Handstand stores the annealed RSI probability here
    # (go2_handstand.py _init_task_state / step).
    task_state: Optional[jax.Array] = None
    # [N] per-env contact-stiffness DR scale (None when the DR is off, so
    # tasks that don't use it keep their exact program/compile cache).
    # Fixed per env at creation like the friction buckets.
    cstiff: Optional[jax.Array] = None
    # [N] per-env actuation-loop DR (DomainRandCfg.randomize_pd_gain /
    # action_delay_prob, r5 transfer work): proportional-gain scale and
    # 1-step-delay mask. None when off — program identity preserved.
    pd_gain: Optional[jax.Array] = None
    act_delay: Optional[jax.Array] = None


class LeggedEnv:
    """Static task description + pure step/reset functions.

    Matches the VecEnv protocol surface the reference exposes to rsl_rl
    (base_task.py:41-89): num_envs/num_obs/num_privileged_obs/num_actions/
    max_episode_length plus step/reset/get_observations — in functional form.
    """

    def __init__(self, cfg: LeggedRobotCfg, robot: Optional[Robot] = None):
        self.cfg = cfg
        contact_bodies = None
        if cfg.asset.prune_contact_bodies:
            contact_bodies = (
                [cfg.asset.foot_name]
                + list(cfg.asset.penalize_contacts_on)
                + list(cfg.asset.terminate_after_contacts_on)
            )
        self.robot = robot or build_robot(
            resource(cfg.asset.file), armature=cfg.asset.armature,
            gravity=tuple(cfg.sim.gravity),
            contact_bodies=contact_bodies,
        )
        r = self.robot
        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.control.decimation * cfg.sim.dt          # _parse_cfg
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(
            np.ceil(self.max_episode_length_s / self.dt)
        )
        self.push_interval = int(
            np.ceil(cfg.domain_rand.push_interval_s / self.dt)
        )
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)

        # --- model-derived constants ---
        self.default_dof_pos = jnp.asarray(
            r.default_dof_pos(cfg.init_state.default_joint_angles),
            jnp.float32,
        )
        kp, kd = r.pd_gains(cfg.control.stiffness, cfg.control.damping)
        if (kp == 0).any():
            for i, name in enumerate(r.dof_names):
                if kp[i] == 0:
                    print(f"PD gain of joint {name} were not defined, setting them to zero")
        # numpy (trace-time constants): the SoA/Pallas backends fold these
        # into the kernel; jnp ops broadcast numpy fine on the vmap path.
        self.pd = eng.PDParams(
            kp=np.asarray(kp, np.float32),
            kd=np.asarray(kd, np.float32),
            torque_limit=np.asarray(r.dof_effort, np.float32),
            clip_torque=True,
        )
        self.cparams = ct.ContactParams(
            iterations=cfg.sim.contact_iterations,
            baumgarte=cfg.sim.contact_baumgarte,
            max_depenetration_velocity=cfg.sim.max_depenetration_velocity,
            terrain_friction=cfg.terrain.static_friction,
            max_angular_velocity=cfg.asset.max_angular_velocity,
            max_linear_velocity=cfg.asset.max_linear_velocity,
        )
        # soft dof-pos limits (legged_robot.py:466-469)
        m = (r.dof_lower + r.dof_upper) / 2
        rng = r.dof_upper - r.dof_lower
        self.dof_pos_soft_lo = jnp.asarray(
            m - 0.5 * rng * cfg.rewards.soft_dof_pos_limit, jnp.float32
        )
        self.dof_pos_soft_hi = jnp.asarray(
            m + 0.5 * rng * cfg.rewards.soft_dof_pos_limit, jnp.float32
        )
        self.dof_vel_limits = jnp.asarray(r.dof_velocity, jnp.float32)
        self.torque_limits = jnp.asarray(r.dof_effort, jnp.float32)

        # body groups (legged_robot.py:346-352, 384-407)
        self.feet_indices = jnp.asarray(
            r.body_indices([cfg.asset.foot_name])
        )
        self.penalised_contact_indices = jnp.asarray(
            r.body_indices(cfg.asset.penalize_contacts_on), dtype=jnp.int32
        )
        self.termination_contact_indices = jnp.asarray(
            r.body_indices(cfg.asset.terminate_after_contacts_on),
            dtype=jnp.int32,
        )
        self.num_feet = int(self.feet_indices.shape[0])

        # commands scale (legged_robot.py:154-155)
        osc = cfg.normalization.obs_scales
        self.commands_scale = jnp.asarray(
            [osc["lin_vel"], osc["lin_vel"], osc["ang_vel"]], jnp.float32
        )

        # base init state (pos/rot/lin/ang, legged_robot.py:354-355)
        self.base_init_pos = jnp.asarray(cfg.init_state.pos, jnp.float32)
        self.base_init_quat = jnp.asarray(cfg.init_state.rot, jnp.float32)

        # terrain (heightfield/trimesh -> sampled heightfield; plane -> z=0)
        self.terrain = None
        self.ground_fn = None
        self.terrain_origins = None
        if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            from unitree_rl_gym_tpu.utils.terrain import Terrain

            self.terrain = Terrain(cfg.terrain, self.num_envs, seed=cfg.seed)
            grid = self.terrain.grid()
            self.grid = grid
            self.ground_fn = grid.height_at
            self.terrain_origins = jnp.asarray(
                self.terrain.env_origins, jnp.float32
            )
            # default-pose world point xy offsets (relative to the base
            # origin, sorted-point order): used to seed the gh carry for
            # just-reset envs without an FK — reset pose is the default
            # pose (joint randomization moves points a few cm; the first
            # post-reset sample absorbs it like any lag-1 staleness).
            self.cp_xy0 = self._default_pose_point_xy()

        # contact-solver preconditioner at nominal pose (numpy: trace-time
        # constant folded into the SoA/Pallas kernels)
        m_eff_n, m_eff_t = ct.point_effective_mass(
            r.dyn, self.base_init_quat, self.base_init_pos,
            self.default_dof_pos,
        )
        self.m_eff_n = np.asarray(m_eff_n, np.float32)
        self.m_eff_t = np.asarray(m_eff_t, np.float32)

        # reward machinery: prune zero scales, multiply by dt
        # (legged_robot.py:821-836)
        self.reward_fns = self._reward_registry()
        self.reward_names = []
        self.reward_scales = []
        for name, scale in cfg.rewards.scales.items():
            if scale == 0 or name == "termination":
                continue
            if name not in self.reward_fns:
                raise KeyError(f"no reward function for scale '{name}'")
            self.reward_names.append(name)
            self.reward_scales.append(scale * self.dt)
        self.termination_scale = (
            cfg.rewards.scales.get("termination", 0.0) * self.dt
        )
        self.episode_term_names = list(self.reward_names) + (
            ["termination"] if self.termination_scale != 0 else []
        )

        self.noise_scale_vec = jnp.asarray(
            self._noise_scale_vec(), jnp.float32
        )

    # ------------------------------------------------------------------
    # overridable hooks (per-robot subclasses)
    # ------------------------------------------------------------------

    def _reward_registry(self):
        return R.BASE_REWARDS

    def _noise_scale_vec(self) -> np.ndarray:
        """Base 48-dim layout (legged_robot.py:188-219)."""
        cfg = self.cfg
        na = self.num_actions
        ns = cfg.noise.noise_scales
        osc = cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        vec = np.zeros(self.num_obs, np.float32)
        vec[0:3] = ns["lin_vel"] * lvl * osc["lin_vel"]
        vec[3:6] = ns["ang_vel"] * lvl * osc["ang_vel"]
        vec[6:9] = ns["gravity"] * lvl
        vec[9:12] = 0.0  # commands
        vec[12:12 + na] = ns["dof_pos"] * lvl * osc["dof_pos"]
        vec[12 + na:12 + 2 * na] = ns["dof_vel"] * lvl * osc["dof_vel"]
        vec[12 + 2 * na:12 + 3 * na] = 0.0  # previous actions
        return vec

    def _build_obs(self, ctx) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Base 48-dim observation (legged_robot.py:789-807)."""
        osc = self.cfg.normalization.obs_scales
        obs = jnp.concatenate(
            (
                ctx.base_lin_vel * osc["lin_vel"],
                ctx.base_ang_vel * osc["ang_vel"],
                ctx.projected_gravity,
                ctx.commands[:, :3] * self.commands_scale,
                (ctx.dof_pos - self.default_dof_pos) * osc["dof_pos"],
                ctx.dof_vel * osc["dof_vel"],
                ctx.actions,
            ),
            axis=-1,
        )
        return obs, None

    def _callback(self, ctx, state: EnvState) -> EnvState:
        """Post-physics, pre-termination hook (humanoids add phase/feet
        tracking here, g1_env.py:56-105). Base: no-op."""
        return state

    def _extra_ctx(self, ctx, state: EnvState):
        """Attach subclass-specific fields to the reward/obs context."""
        return ctx

    def _compute_target(self, actions):
        """action -> PD position target (legged_robot.py:661-664);
        handstand clamps rear-leg targets (go2_handstand_env.py:326-350)."""
        return (
            actions * self.cfg.control.action_scale + self.default_dof_pos
        )

    def _check_termination(self, ctx):
        """reset_buf = illegal contact ∪ tip-over ∪ timeout
        (legged_robot.py:711-721)."""
        cf = ctx.contact_forces[:, self.termination_contact_indices, :]
        illegal = jnp.any(jnp.linalg.norm(cf, axis=-1) > 1.0, axis=1)
        tipped = (jnp.abs(ctx.rpy[:, 1]) > 1.0) | (jnp.abs(ctx.rpy[:, 0]) > 0.8)
        time_out = ctx.episode_length > self.max_episode_length
        return illegal | tipped | time_out, time_out

    # ------------------------------------------------------------------
    # terrain gh carry helpers
    # ------------------------------------------------------------------

    def _default_pose_point_xy(self):
        """World xy of every contact point relative to the base origin at
        the default pose / init orientation, sorted-point order [ncp, 2].
        Computed once at env build (host-side FK)."""
        from unitree_rl_gym_tpu.physics import backend as pback
        from unitree_rl_gym_tpu.physics import dynamics as dyn

        model = self.robot.dyn
        m = pback.soa_model_for(model)
        R_w, p_w, _, v_b = dyn.fk(
            model,
            jnp.zeros(3),
            self.base_init_quat,
            self.default_dof_pos,
            jnp.zeros(6 + self.robot.num_dof),
        )
        x, _ = ct.point_kinematics(model, R_w, p_w, v_b)
        return jnp.asarray(np.asarray(x)[:, :2][m.cp_perm], jnp.float32)

    def _reset_gh(self, base_pos):
        """Exact gh rows [ncp, N] at base xy + default-pose point offsets
        (top-level gather; used by reset_all only — in-scan resets use
        the platform origin height instead, see step)."""
        return jnp.transpose(
            self.ground_fn(base_pos[:, None, :2] + self.cp_xy0[None])
        )

    def refresh_terrain(self, state: EnvState) -> EnvState:
        """Re-center every env's heightfield window on its current base
        position and clear staleness. MUST be called at program top level
        (outside any lax.scan — the fetch is a gather, see
        TerrainGrid.window_at): every ``terrain.window_refresh_steps``
        control steps by the PPO driver (which chunks its rollout scan
        around these calls), every step by eval loops via step's
        ``refresh_terrain=True`` default. No-op for flat-ground tasks."""
        if self.terrain is None:
            return state
        win, corner = self.grid.window_at(
            state.phys.base_pos[:, :2], W=self.cfg.terrain.window_size
        )
        return state.replace(
            win=win, win_corner=corner,
            win_stale=jnp.zeros((self.num_envs,), bool),
        )

    # ------------------------------------------------------------------
    # reset sampling
    # ------------------------------------------------------------------

    def _init_task_state(self):
        """Initial value of EnvState.task_state (None for base tasks)."""
        return None

    def _sample_reset(self, key, n, origins=None, vx_range=None,
                      task_state=None):
        """Fresh physics state + commands for ``n`` envs
        (legged_robot.py:557-594, 519-538). With terrain, spawn at the
        env's sub-terrain origin with ±1 m xy jitter (legged_robot.py:582-585
        custom-origins path). ``task_state`` is the live
        EnvState.task_state for subclasses whose reset distribution
        evolves over training (handstand RSI annealing)."""
        nj = self.robot.num_dof
        k1, k2, k3, k4 = jax.random.split(key, 4)
        dof_pos = self.default_dof_pos * jax.random.uniform(
            k1, (n, nj), minval=0.5, maxval=1.5
        )
        base_vel = jax.random.uniform(k2, (n, 6), minval=-0.5, maxval=0.5)
        # reference order: [lin_vel(world) 7:10, ang_vel(world) 10:13];
        # our v is [ang(body); lin(body)] — identity init rot => same frame
        v = jnp.zeros((n, 6 + nj))
        v = v.at[:, 0:3].set(base_vel[:, 3:6])
        v = v.at[:, 3:6].set(base_vel[:, 0:3])
        base_pos = jnp.broadcast_to(self.base_init_pos, (n, 3))
        if origins is not None and self.terrain is not None:
            base_pos = base_pos + origins
            jitter = jax.random.uniform(k4, (n, 2), minval=-1.0, maxval=1.0)
            base_pos = base_pos.at[:, :2].add(jitter)
        elif origins is not None:
            base_pos = base_pos + origins
        phys = eng.PhysicsState(
            base_pos=base_pos,
            base_quat=jnp.broadcast_to(self.base_init_quat, (n, 4)),
            joint_q=dof_pos,
            v=v,
        )
        commands = self._sample_commands(k3, n, vx_range)
        return phys, commands

    def _sample_commands(self, key, n, vx_range=None):
        cr = self.cfg.commands.ranges
        kx, ky, kz = jax.random.split(key, 3)
        cmd = jnp.zeros((n, 4))
        if vx_range is None:
            vx_lo, vx_hi = cr["lin_vel_x"]
        else:
            vx_lo, vx_hi = vx_range[0], vx_range[1]
        cmd = cmd.at[:, 0].set(
            vx_lo + (vx_hi - vx_lo) * jax.random.uniform(kx, (n,))
        )
        cmd = cmd.at[:, 1].set(
            jax.random.uniform(ky, (n,), minval=cr["lin_vel_y"][0],
                               maxval=cr["lin_vel_y"][1])
        )
        if self.cfg.commands.heading_command:
            cmd = cmd.at[:, 3].set(
                jax.random.uniform(kz, (n,), minval=cr["heading"][0],
                                   maxval=cr["heading"][1])
            )
        else:
            cmd = cmd.at[:, 2].set(
                jax.random.uniform(kz, (n,), minval=cr["ang_vel_yaw"][0],
                                   maxval=cr["ang_vel_yaw"][1])
            )
        # set small commands to zero (legged_robot.py:538)
        keep = (jnp.linalg.norm(cmd[:, :2], axis=1) > 0.2)[:, None]
        cmd = cmd.at[:, :2].multiply(keep.astype(cmd.dtype))
        return cmd

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def reset_all(self, key, init_at_random_ep_len: bool = False):
        """Reset every env; returns (state, obs). Mirrors BaseTask.reset()
        = reset all + one zero-action step (base_task.py:82-86).

        Jitted (cached per ``init_at_random_ep_len``): the trailing step()
        is a huge fused program; running it eagerly would dispatch thousands
        of single-primitive compiles."""
        cache = getattr(self, "_reset_jit_cache", None)
        if cache is None:
            cache = self._reset_jit_cache = {}
        fn = cache.get(init_at_random_ep_len)
        if fn is None:
            from functools import partial

            fn = jax.jit(partial(
                self._reset_all_impl,
                init_at_random_ep_len=init_at_random_ep_len,
            ))
            cache[init_at_random_ep_len] = fn
        return fn(key)

    def _reset_all_impl(self, key, init_at_random_ep_len: bool = False):
        N = self.num_envs
        nj = self.robot.num_dof
        key, k_reset, k_fric, k_bucket, k_mass, k_len, k_lvl = (
            jax.random.split(key, 7)
        )

        # terrain level/type assignment (ETH legged_gym _get_env_origins
        # semantics: start levels <= max_init_terrain_level when curriculum,
        # types striped across columns)
        tcfg = self.cfg.terrain
        if self.terrain is not None:
            max_lvl = (
                min(tcfg.max_init_terrain_level + 1, tcfg.num_rows)
                if tcfg.curriculum else tcfg.num_rows
            )
            terrain_level = jax.random.randint(k_lvl, (N,), 0, max_lvl)
            terrain_type = (jnp.arange(N) * tcfg.num_cols // N).astype(
                jnp.int32
            )
            env_origin = self.terrain_origins[terrain_level, terrain_type]
        else:
            terrain_level = jnp.zeros((N,), jnp.int32)
            terrain_type = jnp.zeros((N,), jnp.int32)
            env_origin = jnp.zeros((N, 3))

        cmd_vx_range = jnp.asarray(
            self.cfg.commands.ranges["lin_vel_x"], jnp.float32
        )
        vx_range = cmd_vx_range if self.cfg.commands.curriculum else None
        task_state = self._init_task_state()
        phys, commands = self._sample_reset(
            k_reset, N, origins=env_origin, vx_range=vx_range,
            task_state=task_state,
        )

        dr = self.cfg.domain_rand
        if dr.randomize_friction:
            # 64 friction buckets (legged_robot.py:432-436)
            buckets = jax.random.uniform(
                k_fric, (64,), minval=dr.friction_range[0],
                maxval=dr.friction_range[1],
            )
            ids = jax.random.randint(k_bucket, (N,), 0, 64)
            friction = buckets[ids]
        else:
            friction = jnp.full((N,), self.cfg.terrain.static_friction)
        if dr.randomize_base_mass:
            added = jax.random.uniform(
                k_mass, (N,), minval=dr.added_mass_range[0],
                maxval=dr.added_mass_range[1],
            )
            mass_scale = 1.0 + added / self.robot.dyn.base_mass
        else:
            mass_scale = jnp.ones((N,))
        cstiff = None
        if getattr(dr, "randomize_contact_stiffness", False):
            cstiff = jax.random.uniform(
                jax.random.fold_in(k_mass, 7), (N,),
                minval=dr.contact_stiffness_range[0],
                maxval=dr.contact_stiffness_range[1],
            )
        pd_gain = None
        if getattr(dr, "randomize_pd_gain", False):
            pd_gain = jax.random.uniform(
                jax.random.fold_in(k_mass, 11), (N,),
                minval=dr.pd_gain_range[0], maxval=dr.pd_gain_range[1],
            )
        act_delay = None
        if getattr(dr, "action_delay_prob", 0.0) > 0.0:
            act_delay = (
                jax.random.uniform(jax.random.fold_in(k_mass, 13), (N,))
                < dr.action_delay_prob
            )

        episode_length = (
            jax.random.randint(k_len, (N,), 0, self.max_episode_length)
            if init_at_random_ep_len
            else jnp.zeros((N,), jnp.int32)
        )

        state = EnvState(
            phys=phys,
            episode_length=episode_length.astype(jnp.int32),
            commands=commands,
            actions=jnp.zeros((N, self.num_actions)),
            last_actions=jnp.zeros((N, self.num_actions)),
            last_dof_vel=jnp.zeros((N, nj)),
            feet_air_time=jnp.zeros((N, self.num_feet)),
            last_contacts=jnp.zeros((N, self.num_feet), bool),
            friction=friction,
            mass_scale=mass_scale,
            episode_sums=jnp.zeros((N, len(self.episode_term_names))),
            env_origin=env_origin,
            terrain_level=terrain_level,
            terrain_type=terrain_type,
            cmd_vx_range=cmd_vx_range,
            obs=jnp.zeros((N, self.num_obs)),
            priv_obs=(
                jnp.zeros((N, self.num_privileged_obs))
                if self.num_privileged_obs else None
            ),
            key=key,
            gh=(
                self._reset_gh(phys.base_pos)
                if self.terrain is not None else None
            ),
            task_state=task_state,
            cstiff=cstiff,
            pd_gain=pd_gain,
            act_delay=act_delay,
        )
        state = self.refresh_terrain(state)
        state, obs, *_ = self.step(state, jnp.zeros((N, self.num_actions)))
        return state, obs

    def step(self, state: EnvState, actions, refresh_terrain: bool = True):
        """One control step for all envs. See module docstring for the
        preserved ordering.

        ``refresh_terrain``: re-center heightfield windows at step start
        (exact heights; right for eval loops calling step at top level).
        The PPO rollout passes False and calls :meth:`refresh_terrain`
        once per rollout instead — window fetches are gathers and must
        stay out of the scan (TerrainGrid.window_at)."""
        cfg = self.cfg
        N = self.num_envs
        if refresh_terrain and self.terrain is not None:
            state = self.refresh_terrain(state)
        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        # ---- physics (decimated PD loop) via the selected backend:
        #      fused Pallas kernel on TPU, batched SoA XLA elsewhere ----
        from unitree_rl_gym_tpu.physics import backend as pback

        # actuation-delay DR: delayed envs actuate the PREVIOUS control
        # step's action (state.actions still holds it here); obs/rewards
        # keep the commanded one — the robot-side view of a delayed loop
        phys_actions = actions
        if state.act_delay is not None:
            phys_actions = jnp.where(
                state.act_delay[:, None], state.actions, actions
            )
        target = self._compute_target(phys_actions)
        if state.pd_gain is not None:
            # per-env proportional-gain scale as a plant-side target
            # transform: tau = kp*((q + g*(t-q)) - q) = g*kp*(t-q) on
            # the first substep (q evolves over the decimated loop, so
            # the effective scale drifts slightly — immaterial for DR)
            target = state.phys.joint_q + state.pd_gain[:, None] * (
                target - state.phys.joint_q
            )
        model, cp, pd = self.robot.dyn, self.cparams, self.pd
        sim_dt, dec = cfg.sim.dt, cfg.control.decimation
        m_n, m_t = self.m_eff_n, self.m_eff_t

        phys, aux = pback.control_step(
            model, cp, pd, sim_dt, dec, state.phys, target,
            state.friction, state.mass_scale, m_n, m_t,
            ground_fn=self.ground_fn,
            backend=getattr(cfg.sim, "backend", "auto"),
            gh=state.gh, cstiff=state.cstiff,
        )
        state = state.replace(phys=phys, actions=actions)

        # ---- post-physics quantities (legged_robot.py:681-690) ----
        episode_length = state.episode_length + 1
        state = state.replace(episode_length=episode_length)

        base_quat = phys.base_quat
        ctx = types.SimpleNamespace(
            cfg=cfg,
            num_envs=N,
            dt=self.dt,
            base_pos=phys.base_pos,
            base_quat=base_quat,
            rpy=tm.get_euler_xyz(base_quat),
            base_ang_vel=phys.v[:, 0:3],
            base_lin_vel=phys.v[:, 3:6],
            projected_gravity=jax.vmap(tm.quat_rotate_inverse)(
                base_quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3))
            ),
            dof_pos=phys.joint_q,
            dof_vel=phys.v[:, 6:],
            last_dof_vel=state.last_dof_vel,
            torques=aux["torques"],
            contact_forces=aux["cf_rb"],
            rb_pos_w=aux["rb_pos_w"],
            rb_vel_w=aux["rb_vel_w"],
            feet_pos=aux["rb_pos_w"][:, self.feet_indices, :],
            feet_vel=aux["rb_vel_w"][:, self.feet_indices, :],
            actions=actions,
            last_actions=state.last_actions,
            episode_length=episode_length,
            feet_indices=self.feet_indices,
            penalised_contact_indices=self.penalised_contact_indices,
            default_dof_pos=self.default_dof_pos,
            dof_pos_soft_lo=self.dof_pos_soft_lo,
            dof_pos_soft_hi=self.dof_pos_soft_hi,
            dof_vel_limits=self.dof_vel_limits,
            torque_limits=self.torque_limits,
            commands=state.commands,
        )
        ctx = self._extra_ctx(ctx, state)

        # ---- command resample + heading controller + subclass callback
        #      (legged_robot.py:488-517) ----
        key, k_cmd, k_push, k_reset, k_noise, k_lvl = jax.random.split(
            state.key, 6
        )
        vx_range = (
            state.cmd_vx_range if cfg.commands.curriculum else None
        )
        resample_mask = (episode_length % self.resample_interval) == 0
        new_cmds = self._sample_commands(k_cmd, N, vx_range)
        commands = jnp.where(
            resample_mask[:, None], new_cmds, state.commands
        )
        if cfg.commands.heading_command:
            forward = jax.vmap(tm.quat_rotate)(
                base_quat, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (N, 3))
            )
            heading = jnp.arctan2(forward[:, 1], forward[:, 0])
            commands = commands.at[:, 2].set(
                jnp.clip(
                    0.5 * tm.wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0
                )
            )
        state = state.replace(commands=commands, key=key)
        ctx.commands = commands
        state = self._callback(ctx, state)

        # ---- termination (legged_robot.py:711-721) ----
        reset_buf, time_out_buf = self._check_termination(ctx)
        ctx.reset_buf = reset_buf
        ctx.time_out_buf = time_out_buf

        # ---- feet air time bookkeeping (inside _reward_feet_air_time in
        #      the reference, legged_robot.py:912-923; hoisted here so the
        #      state update stays fused with resets) ----
        contact = ctx.contact_forces[:, self.feet_indices, 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) * contact_filt
        feet_air_time = state.feet_air_time + self.dt
        ctx.first_contact = first_contact
        ctx.feet_air_time = feet_air_time
        state = state.replace(
            last_contacts=contact,
            feet_air_time=feet_air_time * (~contact_filt),
        )

        # ---- rewards (legged_robot.py:770-787) ----
        rew = jnp.zeros(N)
        term_rews = []
        for name, scale in zip(self.reward_names, self.reward_scales):
            r_i = self.reward_fns[name](ctx) * scale
            rew = rew + r_i
            term_rews.append(r_i)
        if cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew, 0.0, None)
        if self.termination_scale != 0.0:
            r_t = R.termination(ctx) * self.termination_scale
            rew = rew + r_t
            term_rews.append(r_t)
        episode_sums = state.episode_sums + jnp.stack(term_rews, axis=1)

        # ---- curricula, evaluated at reset time ----
        m = reset_buf
        mb = m[:, None]
        terrain_level = state.terrain_level
        env_origin = state.env_origin
        if self.terrain is not None and cfg.terrain.curriculum:
            terrain_level, env_origin = curricula.terrain_curriculum_at_reset(
                cfg.terrain, self.terrain_origins, self.max_episode_length_s,
                k_lvl, m, phys.base_pos, commands, terrain_level,
                state.terrain_type, env_origin,
            )

        cmd_vx_range = state.cmd_vx_range
        if cfg.commands.curriculum:
            idx = self.reward_names.index("tracking_lin_vel")
            cmd_vx_range = curricula.command_curriculum_at_reset(
                cfg.commands.max_curriculum, self.reward_scales[idx],
                self.max_episode_length, m, episode_sums[:, idx],
                cmd_vx_range,
            )

        # ---- fused reset (legged_robot.py:723-768) ----
        reset_phys, reset_cmds = self._sample_reset(
            k_reset, N, origins=env_origin,
            vx_range=cmd_vx_range if cfg.commands.curriculum else None,
            task_state=state.task_state,
        )

        def sel(new, old):
            expand = (...,) + (None,) * (old.ndim - 1)
            return jnp.where(m[expand], new, old)

        phys = eng.PhysicsState(
            base_pos=sel(reset_phys.base_pos, phys.base_pos),
            base_quat=sel(reset_phys.base_quat, phys.base_quat),
            joint_q=sel(reset_phys.joint_q, phys.joint_q),
            v=sel(reset_phys.v, phys.v),
        )
        commands = jnp.where(mb, reset_cmds, commands)
        # episode logging: per-term sums of reset envs (runner divides by
        # count and max_episode_length_s, legged_robot.py:758-763)
        reset_count = jnp.sum(m)
        ep_sums_at_reset = jnp.sum(
            jnp.where(mb, episode_sums, 0.0), axis=0
        )
        ep_len_at_reset = jnp.sum(jnp.where(m, episode_length, 0))
        episode_sums = jnp.where(mb, 0.0, episode_sums)
        actions_post = jnp.where(mb, 0.0, actions)
        state = state.replace(
            phys=phys,
            commands=commands,
            actions=actions_post,
            last_actions=jnp.where(mb, 0.0, state.last_actions),
            last_dof_vel=jnp.where(mb, 0.0, state.last_dof_vel),
            feet_air_time=jnp.where(mb, 0.0, state.feet_air_time),
            last_contacts=jnp.where(mb, False, state.last_contacts),
            episode_length=jnp.where(m, 0, episode_length),
            episode_sums=episode_sums,
            terrain_level=terrain_level,
            env_origin=env_origin,
            cmd_vx_range=cmd_vx_range,
        )

        # ---- terrain gh carry for the next step (lag-free: end-of-step
        #      point xy == next step-start positions). Heights come from
        #      the per-env window einsum (in-scan safe); envs reset since
        #      the last window refresh are out of their window, so they
        #      use their spawn platform height env_origin[2] (terrains
        #      keep a flat platform around the origin; curricula place
        #      origin_z = max height within +-1 m, utils/terrain.py _add)
        #      until refresh_terrain re-centers them. ----
        if self.terrain is not None:
            gh_live = (
                self.grid.height_in_window_rows(
                    state.win, state.win_corner, aux["p_xy"]
                )
                if "p_xy" in aux else state.gh
            )
            stale = state.win_stale | m
            state = state.replace(
                gh=jnp.where(
                    stale[None, :], env_origin[None, :, 2], gh_live
                ),
                win_stale=stale,
            )

        # ---- pushes (legged_robot.py:540-555): overwrite world vxy ----
        if cfg.domain_rand.push_robots:
            state = state.replace(phys=curricula.push_robots(
                k_push, self.push_interval, cfg.domain_rand.max_push_vel_xy,
                state.episode_length, state.phys,
            ))

        # ---- observations (legged_robot.py:789-811) ----
        obs_ctx = self._obs_ctx(state, ctx)
        obs, priv_obs = self._build_obs(obs_ctx)
        if cfg.noise.add_noise:
            noise = (
                2.0 * jax.random.uniform(k_noise, obs.shape) - 1.0
            ) * self.noise_scale_vec
            obs = obs + noise
        clip_o = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_o, clip_o)
        if priv_obs is not None:
            priv_obs = jnp.clip(priv_obs, -clip_o, clip_o)

        # ---- cache last_* (legged_robot.py:707-709) ----
        state = state.replace(
            last_actions=state.actions,
            last_dof_vel=state.phys.v[:, 6:],
            obs=obs,
            priv_obs=priv_obs,
        )

        extras = {
            # internal keys: raw sums so the PPO scan can aggregate across
            # rollout steps without weighting errors (runner divides)
            "episode_sums_at_reset": ep_sums_at_reset,
            "episode_reset_count": reset_count,
            "episode_length_at_reset": ep_len_at_reset,
            # rsl_rl-compatible schema (legged_robot.py:758-765): per-term
            # episode-reward means of the envs reset THIS step, divided by
            # episode length in seconds. Zero-filled when no env reset
            # (the reference would emit NaN there; consumers skip those).
            "episode": {
                "rew_" + name: ep_sums_at_reset[i]
                / jnp.maximum(reset_count, 1)
                / self.max_episode_length_s
                for i, name in enumerate(self.episode_term_names)
            },
        }
        if self.terrain is not None and cfg.terrain.curriculum:
            extras["episode"]["terrain_level"] = jnp.mean(
                terrain_level.astype(jnp.float32)
            )
            extras["terrain_level_mean"] = extras["episode"]["terrain_level"]
        if cfg.commands.curriculum:
            # extras["episode"]["max_command_x"] (legged_robot.py:764-765)
            extras["episode"]["max_command_x"] = cmd_vx_range[1]
            extras["max_command_x"] = cmd_vx_range[1]
        if cfg.env.send_timeouts:
            extras["time_outs"] = time_out_buf
        return state, obs, priv_obs, rew, reset_buf, extras

    def _obs_ctx(self, state: EnvState, ctx):
        """Rebuild the observation context from the post-reset/post-push
        state (the reference recomputes obs from refreshed tensors; resets
        change dof/root state before compute_observations)."""
        phys = state.phys
        N = self.num_envs
        new = types.SimpleNamespace(**vars(ctx))
        new.base_pos = phys.base_pos
        new.base_quat = phys.base_quat
        new.base_ang_vel = phys.v[:, 0:3]
        new.base_lin_vel = phys.v[:, 3:6]
        new.projected_gravity = jax.vmap(tm.quat_rotate_inverse)(
            phys.base_quat,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)),
        )
        new.dof_pos = phys.joint_q
        new.dof_vel = phys.v[:, 6:]
        new.actions = state.actions
        new.commands = state.commands
        new.episode_length = state.episode_length
        return new
