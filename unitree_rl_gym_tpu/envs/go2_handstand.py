"""Go2 handstand task (reference: go2_handstand_env.py + config).

Front feet support, hind feet airborne, base inverted. Overrides
observations (46-dim with contact flags + optional flag bit-flips),
termination (illegal contact ∪ not-inverted ∪ timeout), the PD target
computation (rear-leg targets clamped to ±0.15 rad around the handstand
pose, torques NOT clipped to URDF limits — go2_handstand_env.py:326-350),
and brings 12 task-specific reward terms."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from unitree_rl_gym_tpu.envs import rewards as R
from unitree_rl_gym_tpu.envs.base_env import EnvState, LeggedEnv
from unitree_rl_gym_tpu.physics import engine as eng
from unitree_rl_gym_tpu.utils import math as tm
from unitree_rl_gym_tpu.utils.config import LeggedRobotCfg, TrainCfg

FRONT_JOINTS = ["FL_hip_joint", "FL_thigh_joint", "FL_calf_joint",
                "FR_hip_joint", "FR_thigh_joint", "FR_calf_joint"]
REAR_JOINTS = ["RL_hip_joint", "RL_thigh_joint", "RL_calf_joint",
               "RR_hip_joint", "RR_thigh_joint", "RR_calf_joint"]

# handstand keyframe (go2_handstand_config.py:157-176)
HANDSTAND_POSE = {
    "FL_hip_joint": 0.0, "FL_thigh_joint": -0.89, "FL_calf_joint": -1.5,
    "FR_hip_joint": 0.0, "FR_thigh_joint": -0.89, "FR_calf_joint": -1.5,
    "RL_hip_joint": 0.0, "RL_thigh_joint": 1.7, "RL_calf_joint": -1.853,
    "RR_hip_joint": 0.0, "RR_thigh_joint": 1.7, "RR_calf_joint": -1.853,
}

# footstand keyframe kept for the follow-up task
# (go2_handstand_config.py:183-198)
FOOTSTAND_POSE = {
    "FL_hip_joint": 0.0, "FL_thigh_joint": 0.82, "FL_calf_joint": -1.6,
    "FR_hip_joint": 0.0, "FR_thigh_joint": 0.82, "FR_calf_joint": -1.68,
    "RL_hip_joint": 0.0, "RL_thigh_joint": 1.82, "RL_calf_joint": -1.16,
    "RR_hip_joint": 0.0, "RR_thigh_joint": 1.82, "RR_calf_joint": -1.16,
}

REAR_LIMIT = 0.15        # ±rad around handstand pose (go2_handstand_env.py:46)
CONTACT_FLIP_P = 0.01    # sensor-dropout bit-flip prob (go2_handstand_env.py:163)


class GO2HandstandEnv(LeggedEnv):
    def __init__(self, cfg, robot=None):
        super().__init__(cfg, robot)
        # torques not clipped in the handstand override
        self.pd = dataclasses.replace(self.pd, clip_torque=False)
        didx = {n: i for i, n in enumerate(self.robot.dof_names)}
        self.front_dof_idx = jnp.asarray([didx[n] for n in FRONT_JOINTS])
        self.rear_dof_idx = jnp.asarray([didx[n] for n in REAR_JOINTS])
        self.front_hip_idx = jnp.asarray(
            [didx["FL_hip_joint"], didx["FR_hip_joint"]]
        )
        pose = np.asarray(self.default_dof_pos).copy()
        for n, a in cfg.handstand_pose_joint_angles.items():
            pose[didx[n]] = a
        self.pose_targets = jnp.asarray(pose, jnp.float32)
        self.rear_center = self.pose_targets[self.rear_dof_idx]
        # feet split: feet_indices order is FL, FR, RL, RR (traversal order)
        self.front_feet_indices = self.feet_indices[jnp.asarray([0, 1])]
        self.hind_feet_indices = self.feet_indices[jnp.asarray([2, 3])]
        self._mid_tables = self._build_mid_tables()

    def _reward_registry(self):
        return R.HANDSTAND_REWARDS

    def _compute_target(self, actions):
        """Rear-leg targets clamped near the handstand pose
        (go2_handstand_env.py:326-350)."""
        targets = (
            self.default_dof_pos + self.cfg.control.action_scale * actions
        )
        lo = self.rear_center - REAR_LIMIT
        hi = self.rear_center + REAR_LIMIT
        rear = jnp.clip(targets[:, self.rear_dof_idx], lo, hi)
        return targets.at[:, self.rear_dof_idx].set(rear)

    def _extra_ctx(self, ctx, state: EnvState):
        ctx.pose_targets = self.pose_targets
        ctx.front_dof_idx = self.front_dof_idx
        ctx.rear_dof_idx = self.rear_dof_idx
        ctx.front_hip_idx = self.front_hip_idx
        ctx.front_feet_indices = self.front_feet_indices
        ctx.hind_feet_indices = self.hind_feet_indices
        return ctx

    def _check_termination(self, ctx):
        """illegal contact ∪ not-inverted ∪ timeout
        (go2_handstand_env.py:178-219).

        Deviation from the reference, by necessity: the reference's
        sideways band ``-0.2 < g_z < 0.2`` terminates unconditionally
        (go2_handstand_env.py:211-212), but every episode starts upright
        (g_z=-1) and any kick-up to inversion (g_z=+1) must cross that
        band — as literally written the check makes the task unlearnable,
        and the reference's own comment says to train with it disabled
        first ("你也可以先关掉这条，等稳定了再打开").  We keep the check but
        gate it behind a grace period (``cfg.env.fallen_grace_s``, default
        1 s) so the kick-up is legal and only post-transition falls
        terminate."""
        cf = ctx.contact_forces[:, self.termination_contact_indices, :]
        illegal = jnp.any(jnp.linalg.norm(cf, axis=-1) > 1.0, axis=1)
        cos_up = ctx.projected_gravity[:, 2]
        fallen = (cos_up > -0.2) & (cos_up < 0.2)
        grace_s = getattr(self.cfg.env, "fallen_grace_s", 1.0)
        grace_steps = int(round(grace_s / self.dt))
        fallen = fallen & (ctx.episode_length > grace_steps)
        time_out = ctx.episode_length > self.max_episode_length
        return illegal | fallen | time_out, time_out

    def _noise_scale_vec(self) -> np.ndarray:
        """46-dim layout: gyro, gravity, q, qd, actions, contact flags
        (go2_handstand_env.py:386-423). Flags get bit-flip noise instead of
        additive noise (handled in _build_obs)."""
        cfg = self.cfg
        na = self.num_actions
        ns = cfg.noise.noise_scales
        osc = cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        vec = np.zeros(self.num_obs, np.float32)
        i = 0
        vec[i:i + 3] = lvl * ns["gyro"] * osc["ang_vel"]; i += 3
        vec[i:i + 3] = lvl * ns["gravity"]; i += 3
        vec[i:i + na] = lvl * ns["dof_pos"] * osc["dof_pos"]; i += na
        vec[i:i + na] = lvl * ns["dof_vel"] * osc["dof_vel"]; i += na
        # actions (no noise) + 4 contact flags (bit-flip handled separately)
        return vec

    def _build_obs(self, ctx):
        """46-dim obs (go2_handstand_env.py:140-173); priv = clone."""
        osc = self.cfg.normalization.obs_scales
        front = (
            ctx.contact_forces[:, self.front_feet_indices, 2] > 5.0
        ).astype(jnp.float32)
        hind = (
            ctx.contact_forces[:, self.hind_feet_indices, 2] > 5.0
        ).astype(jnp.float32)
        obs = jnp.concatenate(
            (
                ctx.base_ang_vel * osc["ang_vel"],
                ctx.projected_gravity,
                (ctx.dof_pos - self.default_dof_pos) * osc["dof_pos"],
                ctx.dof_vel * osc["dof_vel"],
                ctx.actions,
                front,
                hind,
            ),
            axis=-1,
        )
        return obs, obs

    def _build_mid_tables(self):
        """Host-side FK tables over the kick-up pitch angle th:
        (th_grid, base height with the lowest front foot ON the ground,
        body-frame base->front-feet-mid offset [3]). Used by the
        mid-transition RSI so sampled states are dynamically consistent —
        front feet planted, base translating as a rotation about the
        contact point — instead of floating states the policy can't brake
        from (the r3 p4/p6 failure: braking practice from airborne states
        transfers nothing to a real kick-up pivoting on the feet)."""
        from unitree_rl_gym_tpu.physics import dynamics as dyn

        ths = np.deg2rad(np.linspace(30.0, 210.0, 25)).astype(np.float32)
        d0 = np.asarray(self.default_dof_pos)
        hs = np.asarray(self.pose_targets)
        front = np.asarray(self.front_feet_indices)
        heights, r_body = [], []
        for th in ths:
            alpha = float(np.clip((th - np.deg2rad(30.0))
                                  / np.deg2rad(120.0), 0.0, 1.0))
            joints = d0 + alpha * (hs - d0)
            quat = np.array([0.0, np.sin(th / 2), 0.0, np.cos(th / 2)],
                            np.float32)
            R_w, p_w, _, v_b = dyn.fk(
                self.robot.dyn, jnp.zeros(3), jnp.asarray(quat),
                jnp.asarray(joints), jnp.zeros(6 + self.robot.num_dof),
            )
            from unitree_rl_gym_tpu.physics import engine as eng

            rb_pos, _ = eng.rb_states(self.robot.dyn, R_w, p_w, v_b)
            feet = np.asarray(rb_pos)[front]       # [2, 3], base at origin
            foot_r = 0.022                         # go2 foot sphere radius
            heights.append(foot_r - float(feet[:, 2].min()))
            mid = feet.mean(axis=0)                # world, base at origin
            # rotate into body frame: r_b = R0^T * mid
            R0 = np.asarray(tm.quat_to_rotmat(jnp.asarray(quat)))
            r_body.append(R0.T @ mid)
        return (
            jnp.asarray(ths),
            jnp.asarray(np.asarray(heights, np.float32)),
            jnp.asarray(np.asarray(r_body, np.float32)),
        )

    def _init_task_state(self):
        """EnvState.task_state = live RSI probability (annealed in step)."""
        p0 = float(getattr(self.cfg.init_state, "handstand_init_prob", 0.0))
        return jnp.asarray(p0, jnp.float32)

    def _sample_reset(self, key, n, origins=None, vx_range=None,
                      task_state=None):
        """Reference-state initialisation (RSI): with probability
        ``task_state`` (annealed from ``cfg.init_state.handstand_init_prob``
        to ``handstand_init_prob_final``, see :meth:`step`) an env resets
        *near the inverted pose* (joints at the handstand keyframe, trunk
        pitched 150°-200° nose-down, at rest) instead of upright.

        Rationale: the handstand reward surface is flat everywhere the
        upright-started policy can reach — ``orientation``/``pose`` are
        exp-shaped around the inverted pose and numerically zero below
        g_z≈0, so vanilla exploration never finds the kick-up (observed:
        1500-iter runs converge to a tucked crouch).  Seeding early
        episodes at the goal teaches balance directly and gives the
        critic a high-value target; annealing the probability to zero
        then forces the policy to learn the kick-up *transition* from
        upright starts — reproducing the reference's staged-termination
        training intent (go2_handstand_env.py:211-212 comment).  This is
        a training-time exploration aid on top of the reference's env
        semantics (rewards/termination/obs are unchanged)."""
        phys, commands = super()._sample_reset(key, n, origins, vx_range)
        p_inv = (
            task_state if task_state is not None
            else self._init_task_state()
        )
        if isinstance(p_inv, float) and p_inv <= 0.0:
            return phys, commands
        k_sel, k_th, k_yaw, k_q, k_h, k_mid, k_w = jax.random.split(
            jax.random.fold_in(key, 17), 7
        )
        inv = jax.random.uniform(k_sel, (n,)) < p_inv
        # Of the RSI episodes, ``handstand_mid_frac`` start MID-TRANSITION:
        # partially pitched with a forward pitch-rate — the states a
        # kick-up actually passes through. Without these, the policy can
        # hold from the at-rest inverted distribution yet never learns to
        # BRAKE its own kick-up (r3 observation: 100% 11 s holds from
        # inverted rest + 31% kick-ups, 0% kick-up-to-hold).
        mid_frac = float(
            getattr(self.cfg.init_state, "handstand_mid_frac", 0.5)
        )
        mid = inv & (jax.random.uniform(k_mid, (n,)) < mid_frac)
        # trunk pitched th about +y (nose down); g_z = -cos(th) > 0.8 for
        # th in (143°, 217°). Hold states: th in [150°, 200°] at rest.
        # Mid states: th in [40°, 150°] with pitch-rate toward inversion.
        th_hold = jax.random.uniform(
            k_th, (n,), minval=jnp.deg2rad(150.0), maxval=jnp.deg2rad(200.0)
        )
        th_mid = jax.random.uniform(
            jax.random.fold_in(k_th, 1), (n,),
            minval=jnp.deg2rad(40.0), maxval=jnp.deg2rad(150.0),
        )
        th = jnp.where(mid, th_mid, th_hold)
        yaw = jax.random.uniform(k_yaw, (n,), minval=-jnp.pi, maxval=jnp.pi)
        half_t, half_y = th * 0.5, yaw * 0.5
        # quat = rot_z(yaw) * rot_y(th), xyzw layout
        cy, sy = jnp.cos(half_y), jnp.sin(half_y)
        ct, st = jnp.cos(half_t), jnp.sin(half_t)
        q_inv = jnp.stack(
            (-sy * st, cy * st, sy * ct, cy * ct), axis=-1
        )
        # joints: handstand keyframe when near-inverted; lerp from the
        # default crouch along the transition for mid states
        alpha = jnp.clip(
            (th - jnp.deg2rad(30.0)) / jnp.deg2rad(120.0), 0.0, 1.0
        )[:, None]
        pose_lerp = (
            self.default_dof_pos
            + alpha * (self.pose_targets - self.default_dof_pos)
        )
        joints = pose_lerp + jax.random.uniform(
            k_q, (n, self.robot.num_dof), minval=-0.05, maxval=0.05
        )
        # mid-state base height: front feet planted on the ground (host
        # FK table) — braking is only learnable with ground contact; a
        # floating lerp (r3 p4/p6) teaches nothing transferable
        th_g, h_g, r_g = self._mid_tables
        h_feet = jnp.interp(th, th_g, h_g)
        height_hold = jax.random.uniform(k_h, (n,), minval=0.45, maxval=0.55)
        height = jnp.where(
            mid,
            h_feet + jax.random.uniform(
                jax.random.fold_in(k_h, 1), (n,), minval=0.0, maxval=0.02
            ),
            height_hold,
        )
        # pitch-rate toward inversion for mid states (rotation is about
        # the body y axis, so body ang vel = (0, w, 0)). Range calibrated
        # to the policy's ACTUAL kick-up arrival rates: measured r3,
        # crossings happen at 3.2-6.5 rad/s (median ~4.9).
        w_lo, w_hi = getattr(
            self.cfg.init_state, "handstand_mid_w", (2.0, 7.0)
        )
        w_pitch = jnp.where(
            mid,
            jax.random.uniform(k_w, (n,), minval=w_lo, maxval=w_hi),
            0.0,
        )
        # base linear velocity consistent with rotating about the planted
        # front feet: v_b = -omega_b x r_b with omega_b = (0, w, 0) and
        # r_b = base->feet-mid in body frame  =>  (-w*rz, 0, w*rx)
        rx = jnp.interp(th, th_g, r_g[:, 0])
        rz = jnp.interp(th, th_g, r_g[:, 2])
        v_lin_x = jnp.where(mid, -w_pitch * rz, 0.0)
        v_lin_z = jnp.where(mid, w_pitch * rx, 0.0)
        base_pos = phys.base_pos.at[:, 2].set(
            jnp.where(inv, height, phys.base_pos[:, 2])
        )
        m = inv[:, None]
        v_rsi = (
            jnp.zeros_like(phys.v)
            .at[:, 1].set(w_pitch)
            .at[:, 3].set(v_lin_x)
            .at[:, 5].set(v_lin_z)
        )
        phys = eng.PhysicsState(
            base_pos=base_pos,
            base_quat=jnp.where(m, q_inv, phys.base_quat),
            joint_q=jnp.where(m, joints, phys.joint_q),
            v=jnp.where(m, v_rsi, phys.v),
        )
        return phys, commands

    def step(self, state, actions, refresh_terrain: bool = True):
        """Adds (a) the contact-flag bit-flip after the base pipeline's
        noise (go2_handstand_env.py:160-169): each of the last 4 dims
        flips with p=0.01 when noise is on; (b) the RSI-probability
        anneal: task_state decays linearly from
        ``init_state.handstand_init_prob`` to
        ``handstand_init_prob_final`` over ``handstand_anneal_steps``
        control steps, so late training resets upright and the policy
        must learn the kick-up."""
        state, obs, priv, rew, reset, extras = super().step(
            state, actions, refresh_terrain
        )
        if self.cfg.noise.add_noise and CONTACT_FLIP_P > 0:
            key, k = jax.random.split(state.key)
            flips = jax.random.uniform(k, (self.num_envs, 4)) < CONTACT_FLIP_P
            flags = obs[:, -4:] > 0.5
            obs = obs.at[:, -4:].set(
                jnp.logical_xor(flags, flips).astype(obs.dtype)
            )
            state = state.replace(key=key, obs=obs)
        ist = self.cfg.init_state
        p0 = float(getattr(ist, "handstand_init_prob", 0.0))
        p1 = float(getattr(ist, "handstand_init_prob_final", p0))
        steps = float(getattr(ist, "handstand_anneal_steps", 0.0))
        if steps > 0 and p1 < p0:
            p = jnp.maximum(p1, state.task_state - (p0 - p1) / steps)
            state = state.replace(task_state=p)
        extras["episode"]["hs_init_prob"] = state.task_state
        return state, obs, priv, rew, reset, extras


def go2_handstand_cfg() -> LeggedRobotCfg:
    cfg = LeggedRobotCfg()
    # env (go2_handstand_config.py:6-11)
    cfg.env.num_observations = 46
    cfg.env.num_privileged_obs = 46
    cfg.env.num_actions = 12
    # init_state (go2_handstand_config.py:13-31)
    cfg.init_state.pos = [0.0, 0.0, 0.28]
    # Annealed RSI (see GO2HandstandEnv._sample_reset): start with every
    # episode near the inverted pose (learn balance), decay linearly over
    # the first 2000 iterations (x24 steps/iter) to a 25% inverted-start
    # mix so the rest of training practices the kick-up from upright
    # while the hold skill stays anchored (the r3 campaign recipe that
    # produced the shipped artifact — doc/handstand_r3_notes.md; decaying
    # all the way to 0 makes the policy stop attempting).
    cfg.init_state.handstand_init_prob = 1.0
    cfg.init_state.handstand_init_prob_final = 0.25
    cfg.init_state.handstand_anneal_steps = 48_000
    # fallen-band termination grace (see _check_termination): long enough
    # to cross the sideways band during a kick-up from upright
    cfg.env.fallen_grace_s = 1.5
    # Contact-stiffness DR (r4, no reference analog): the r3 hold
    # exploited the impulse solver's soft de-penetration response (base
    # bounced 0.15-0.35 m on the contacts) and died under MuJoCo's
    # stiffer solver (doc/handstand_r3_notes.md). Randomizing the
    # per-env contact stiffness x0.5-3.0 forces holds that don't tune
    # themselves to one exact contact response.
    cfg.domain_rand.randomize_contact_stiffness = True
    cfg.init_state.default_joint_angles = {
        "FL_hip_joint": 0.3, "FR_hip_joint": -0.3,
        "FL_thigh_joint": 1.2, "FR_thigh_joint": 1.2,
        "FL_calf_joint": -2.0, "FR_calf_joint": -2.0,
        "RL_hip_joint": 0.1, "RR_hip_joint": -0.1,
        "RL_thigh_joint": 0.3, "RR_thigh_joint": 0.3,
        "RL_calf_joint": -1.4, "RR_calf_joint": -1.4,
    }
    # control (go2_handstand_config.py:33-38)
    cfg.control.control_type = "P"
    cfg.control.stiffness = {"joint": 35.0}
    cfg.control.damping = {"joint": 0.5}
    cfg.control.action_scale = 0.3
    cfg.control.decimation = 5
    # asset (go2_handstand_config.py:40-46)
    cfg.asset.file = "resources/robots/go2/urdf/go2.urdf"
    cfg.asset.name = "go2"
    cfg.asset.foot_name = "foot"
    cfg.asset.penalize_contacts_on = ["thigh", "calf", "hip"]
    cfg.asset.terminate_after_contacts_on = [
        "base", "thigh", "calf", "hip", "Head_lower", "Head_upper",
    ]
    cfg.asset.self_collisions = 1
    # noise (go2_handstand_config.py:48-58)
    cfg.noise.add_noise = True
    cfg.noise.noise_level = 1.0
    cfg.noise.noise_scales.update(
        gyro=0.2, gravity=0.05, dof_pos=0.01, dof_vel=1.5,
        lin_vel=0.1, actions=0.0,
    )
    # rewards (go2_handstand_config.py:60-133)
    cfg.rewards.only_positive_rewards = False
    cfg.rewards.base_height_target = 0.65
    cfg.rewards.soft_dof_pos_limit = 0.9
    cfg.rewards.scales = dict(
        orientation=5.0,
        base_height=2.0,
        front_feet_contact=3.0,
        hind_feet_no_contact=3.0,
        pose=10.0,
        stability=1.0,
        stay_still=2.0,
        lin_vel_xy=-3.0,
        lin_vel_z=-0.001,
        ang_vel_xy=-0.005,
        torques=-2e-4,
        dof_vel=-1e-5,
        dof_acc=0.0,
        action_rate=-0.006,
        dof_pos_limits=-1.0,
        dof_vel_limits=0.0,
        torque_limits=0.0,
        collision=-2.0,
        front_hip_neutral=2.0,
        front_feet_together=1.5,
        feet_contact_forces=0.0,
        termination=-5.0,
        tracking_lin_vel=0.0,
        tracking_ang_vel=0.0,
        feet_air_time=0.0,
        stumble=0.0,
        energy=0.0,
    )
    cfg.handstand_pose_joint_angles = dict(HANDSTAND_POSE)
    cfg.footstand_pose_joint_angles = dict(FOOTSTAND_POSE)
    return cfg


def go2_handstand_train_cfg() -> TrainCfg:
    t = TrainCfg()
    t.algorithm.entropy_coef = 0.01
    t.runner.experiment_name = "go2_handstand"
    # 2000 annealed-RSI iters + 3000 at the 25% mix (the shipped-artifact
    # recipe, doc/handstand_r3_notes.md)
    t.runner.max_iterations = 5000
    return t
