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
        self.front_thigh_idx = jnp.asarray(
            [didx["FL_thigh_joint"], didx["FR_thigh_joint"]]
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
        self._hold_tables = self._build_hold_tables()

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
        # Training-time staging of the illegal-contact termination
        # (cfg.env.illegal_contact_grace_s, default 0 = stock reference
        # behavior, and 0 in every eval): the r5 arrival diagnostics
        # (scripts/handstand_diag.py, doc/handstand_r5_notes.md) showed
        # the policy attempts its kick-up 0.1-0.4 s after reset and every
        # attempt dies by illegal contact DURING the transition — PPO can
        # never collect reward through the contact-rich trajectory, so
        # the kick never refines. Granting a short immunity window at
        # episode start makes the transition learnable; holds are
        # unaffected (they must stay contact-clean past the window), and
        # the knob anneals to 0 before shipping — same staging philosophy
        # as the fallen band below.
        ig_s = float(getattr(self.cfg.env, "illegal_contact_grace_s", 0.0))
        if ig_s > 0.0:
            illegal = illegal & (
                ctx.episode_length > int(round(ig_s / self.dt))
            )
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

    def ppo_state_class_fn(self, obs):
        """Task-critical-state classifier for the PPO re-weighting
        (AlgorithmCfg.class_target_frac): 1.0 above a g_z threshold
        (cfg.init_state.handstand_class_gz_threshold, default 0.0 = the
        inverted hemisphere — upright idle is g_z ~ -1,
        doc/handstand_r4_notes.md). The r5 entry work lowers the
        threshold to -0.8 so pivot-ENTRY states (a 40 deg planted lean
        is g_z ~ -0.77) are also protected from being drowned by
        upright-idle samples. Reads g_z straight from the obs (col 5 of
        the 46-dim layout; unscaled, noise sigma 0.05 is negligible
        against the split)."""
        th = float(getattr(
            self.cfg.init_state, "handstand_class_gz_threshold", 0.0
        ))
        return (obs[..., 5] > th).astype(jnp.float32)

    def ppo_anchor_mask_fn(self, obs):
        """Anchor-KL mask (AlgorithmCfg.anchor_kl_coef): ALWAYS the
        inverted hemisphere (g_z > 0) regardless of the re-weighting
        threshold above — the hold skill lives there and must not erode,
        while entry/transition states below the hemisphere are exactly
        what a kick-up fine-tune must remain free to change."""
        return (obs[..., 5] > 0.0).astype(jnp.float32)

    def _fk_table(self, ths, pose_fn):
        """Host-side FK table over the kick-up pitch angle th:
        (base height with the lowest front foot ON the ground, body-frame
        base->front-feet-mid offset [3]) for ``joints = pose_fn(th)``.
        Used by the RSI so sampled states are dynamically consistent —
        front feet planted, base translating as a rotation about the
        contact point — instead of floating states the policy can't brake
        from (the r3 p4/p6 failure: braking practice from airborne states
        transfers nothing to a real kick-up pivoting on the feet)."""
        from unitree_rl_gym_tpu.physics import dynamics as dyn
        from unitree_rl_gym_tpu.physics import engine as eng

        front = np.asarray(self.front_feet_indices)
        heights, r_body = [], []
        for th in ths:
            quat = np.array([0.0, np.sin(th / 2), 0.0, np.cos(th / 2)],
                            np.float32)
            R_w, p_w, _, v_b = dyn.fk(
                self.robot.dyn, jnp.zeros(3), jnp.asarray(quat),
                jnp.asarray(pose_fn(th)), jnp.zeros(6 + self.robot.num_dof),
            )
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

    def _build_mid_tables(self):
        """Mid-transition RSI table: pose lerped from the upright crouch
        toward the keyframe along the kick-up (th 0..210 deg; the pose
        stays the default crouch below 30 deg, so the th < 30 rows are
        the ENTRY bridge — a barely-pitched planted crouch, used by the
        r5 entry drill that chains upright stance into the braking
        basin). Grid spacing is unchanged (7.5 deg), so interp values on
        the original 30..210 range are bit-identical."""
        d0 = np.asarray(self.default_dof_pos)
        hs = np.asarray(self.pose_targets)

        def lerp_pose(th):
            alpha = float(np.clip((th - np.deg2rad(30.0))
                                  / np.deg2rad(120.0), 0.0, 1.0))
            return d0 + alpha * (hs - d0)

        ths = np.deg2rad(np.linspace(0.0, 210.0, 29)).astype(np.float32)
        return self._fk_table(ths, lerp_pose)

    def _com_feet_offset(self, th, joints):
        """World-x offset from the front-feet midpoint to the total CoM at
        pitch th with the given joints (host-side; >0 = CoM is ahead of
        the support line and the robot will topple toward its back)."""
        from unitree_rl_gym_tpu.physics import dynamics as dyn
        from unitree_rl_gym_tpu.physics import engine as eng

        m = self.robot.dyn
        quat = np.array([0.0, np.sin(th / 2), 0.0, np.cos(th / 2)],
                        np.float32)
        R_w, p_w, _, v_b = dyn.fk(
            m, jnp.zeros(3), jnp.asarray(quat), jnp.asarray(joints),
            jnp.zeros(6 + self.robot.num_dof),
        )
        R_w, p_w = np.asarray(R_w), np.asarray(p_w)
        Isp = np.asarray(m.I_sp)
        masses = Isp[:, 5, 5]
        S = Isp[:, 0:3, 3:6] / np.maximum(masses, 1e-9)[:, None, None]
        coms_b = np.stack((S[:, 2, 1], S[:, 0, 2], S[:, 1, 0]), axis=-1)
        com_w = (R_w @ coms_b[..., None])[..., 0] + p_w
        com_x = (masses * com_w[:, 0]).sum() / masses.sum()
        rbp, _ = eng.rb_states(m, jnp.asarray(R_w), jnp.asarray(p_w), v_b)
        feet_x = np.asarray(rbp)[np.asarray(self.front_feet_indices), 0]
        return com_x - feet_x.mean()

    def _build_hold_tables(self):
        """Hold-state RSI table over th 95..125 deg with BALANCE-CORRECTED
        keyframe poses: front thighs flexed by a per-th delta that puts
        the front-feet support line under the total CoM.

        Why: at the raw keyframe the CoM sits over the feet only at
        th ~ 93 deg (g_z ~ 0.05) — INSIDE the reference's fallen-band
        termination (|g_z| < 0.2, go2_handstand_env.py:211-212). The only
        statically balanceable handstands that survive the fallen check
        need the feet pulled ~0.1-0.2 m toward the head, i.e. front
        thighs ~0.2-0.45 rad off the keyframe (pose-reward cost ~2x, but
        alive beats terminated by an order of magnitude in return).
        Seeding RSI at raw-keyframe th in [150, 200] deg (r3) or even
        [105, 140] deg gave starts that topple within 0.5 s open loop —
        nothing holdable to learn from (doc/handstand_r4_notes.md).

        Returns (th_grid, planted heights, body-frame base->feet-mid
        offsets [3], front-thigh deltas)."""
        hs = np.asarray(self.pose_targets)
        didx = {n: i for i, n in enumerate(self.robot.dof_names)}
        th_idx = [didx["FL_thigh_joint"], didx["FR_thigh_joint"]]
        ths = np.deg2rad(np.linspace(95.0, 125.0, 7)).astype(np.float32)

        def balanced_pose(th):
            # bisection on the common front-thigh delta zeroing the
            # CoM-feet offset (offset is monotone in the delta over the
            # probed range)
            def off(d):
                p = hs.copy()
                p[th_idx] += d
                return self._com_feet_offset(th, p)

            lo, hi = -0.9, 0.9
            olo, ohi = off(lo), off(hi)
            if olo * ohi > 0:          # no zero in range: nearest end
                d = lo if abs(olo) < abs(ohi) else hi
            else:
                for _ in range(14):
                    mid = 0.5 * (lo + hi)
                    if off(mid) * olo <= 0:
                        hi = mid
                    else:
                        lo, olo = mid, off(mid)
                d = 0.5 * (lo + hi)
            p = hs.copy()
            p[th_idx] += d
            return p, d

        deltas = []
        poses = {}
        for th in ths:
            p, d = balanced_pose(th)
            poses[float(th)] = p
            deltas.append(d)
        tab = self._fk_table(ths, lambda th: poses[float(th)])
        return tab + (jnp.asarray(np.asarray(deltas, np.float32)),)

    def _init_task_state(self):
        """EnvState.task_state = live RSI probability (annealed in step)."""
        p0 = float(getattr(self.cfg.init_state, "handstand_init_prob", 0.0))
        return jnp.asarray(p0, jnp.float32)

    def _sample_reset(self, key, n, origins=None, vx_range=None,
                      task_state=None):
        """Reference-state initialisation (RSI): with probability
        ``task_state`` (annealed from ``cfg.init_state.handstand_init_prob``
        to ``handstand_init_prob_final``, see :meth:`step`) an env resets
        *in a handstand* (joints at the keyframe, trunk pitched nose-down,
        front feet planted on the ground) instead of upright.

        Hold states are seeded in the PHYSICALLY BALANCEABLE band
        th in ``handstand_hold_th_deg`` (default 105-140 deg, g_z
        0.26-0.77): keyframe FK puts the planted base at 0.36-0.52 m
        there with the hind feet 0.74-0.92 m up — a real handstand with
        the CoM near the front-feet support line. The r3 recipe seeded
        th 150-200 deg (g_z > 0.87) instead, where the planted base
        height is <= 0.29 m and the CoM lies far outside the support
        line: no static hold exists in that band for ANY policy, which
        is why every r3 "hold" sank and terminated within ~0.4 s (r4
        diagnosis, doc/handstand_r4_notes.md). The reference rewards
        this band harder (orientation targets g_z=+1,
        go2_handstand_env.py:224-234) but its own success description —
        front legs supporting, rear legs lifted, stable inversion — is
        only realizable in the vertical band; rewards/termination/obs
        are untouched, so training simply discovers the best stable
        compromise the reward set admits.

        Rationale for RSI itself: the handstand reward surface is flat
        everywhere the upright-started policy can reach, so vanilla
        exploration never finds the kick-up (observed: 1500-iter runs
        converge to a tucked crouch). Seeding early episodes at the goal
        teaches balance directly; annealing the probability then forces
        the policy to learn the kick-up *transition* from upright starts
        — the reference's staged-termination training intent
        (go2_handstand_env.py:211-212 comment)."""
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
        # trunk pitched th about +y (nose down); g_z = -cos(th).
        # Hold states: th in the balanceable band (see docstring), planted
        # keyframe pose, ~at rest. Mid states: th in [40°, 140°] partway
        # through the kick-up with pitch-rate toward inversion.
        th_lo, th_hi = getattr(
            self.cfg.init_state, "handstand_hold_th_deg", (100.0, 120.0)
        )
        th_hold = jax.random.uniform(
            k_th, (n,), minval=jnp.deg2rad(th_lo), maxval=jnp.deg2rad(th_hi)
        )
        mid_lo, mid_hi = getattr(
            self.cfg.init_state, "handstand_mid_th_deg", (40.0, 140.0)
        )
        th_mid = jax.random.uniform(
            jax.random.fold_in(k_th, 1), (n,),
            minval=jnp.deg2rad(mid_lo), maxval=jnp.deg2rad(mid_hi),
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
        # joints: the balance-corrected keyframe (front thighs flexed so
        # the feet sit under the CoM, _build_hold_tables) for hold
        # states; lerp from the default crouch along the transition for
        # mid states
        th_gh, h_gh, r_gh, d_gh = self._hold_tables
        alpha = jnp.clip(
            (th - jnp.deg2rad(30.0)) / jnp.deg2rad(120.0), 0.0, 1.0
        )[:, None]
        pose_lerp = (
            self.default_dof_pos
            + alpha * (self.pose_targets - self.default_dof_pos)
        )
        dthigh = jnp.interp(th, th_gh, d_gh)
        pose_hold = jnp.broadcast_to(
            self.pose_targets, (n, self.robot.num_dof)
        )
        pose_hold = pose_hold.at[:, self.front_thigh_idx].add(
            dthigh[:, None]
        )
        pose_sel = jnp.where(mid[:, None], pose_lerp, pose_hold)
        joints = pose_sel + jax.random.uniform(
            k_q, (n, self.robot.num_dof), minval=-0.05, maxval=0.05
        )
        # base height: front feet planted on the ground (host FK tables;
        # hold and mid states use their own pose's table) — balance and
        # braking are only learnable with ground contact. The r3 recipe
        # dropped hold states from U(0.45, 0.55) with the feet ~0.35 m in
        # the air, so every "hold" episode actually began with a fall and
        # an unstable catch.
        th_g, h_g, r_g = self._mid_tables
        h_feet_mid = jnp.interp(th, th_g, h_g)
        h_feet_hold = jnp.interp(th, th_gh, h_gh)
        h_feet = jnp.where(mid, h_feet_mid, h_feet_hold)
        height = h_feet + jax.random.uniform(
            jax.random.fold_in(k_h, 1), (n,), minval=0.0, maxval=0.02
        )
        # pitch-rate toward inversion for mid states (rotation is about
        # the body y axis, so body ang vel = (0, w, 0)); a small +-w
        # perturbation for hold states so balance corrections are in the
        # training distribution.
        w_lo, w_hi = getattr(
            self.cfg.init_state, "handstand_mid_w", (1.5, 6.0)
        )
        w_hold = getattr(self.cfg.init_state, "handstand_hold_w", 0.3)
        w_pitch = jnp.where(
            mid,
            jax.random.uniform(k_w, (n,), minval=w_lo, maxval=w_hi),
            jax.random.uniform(
                jax.random.fold_in(k_w, 1), (n,),
                minval=-w_hold, maxval=w_hold,
            ),
        )
        # base linear velocity consistent with rotating about the planted
        # front feet: v_b = -omega_b x r_b with omega_b = (0, w, 0) and
        # r_b = base->feet-mid in body frame  =>  (-w*rz, 0, w*rx)
        rx = jnp.where(
            mid, jnp.interp(th, th_g, r_g[:, 0]),
            jnp.interp(th, th_gh, r_gh[:, 0]),
        )
        rz = jnp.where(
            mid, jnp.interp(th, th_g, r_g[:, 2]),
            jnp.interp(th, th_gh, r_gh[:, 2]),
        )
        v_lin_x = -w_pitch * rz
        v_lin_z = w_pitch * rx
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
    # RSI (see GO2HandstandEnv._sample_reset): every episode starts
    # planted in the balanceable band — the single-run "balance
    # bootcamp" default. The shipped artifact is trained by the STAGED
    # recipe in scripts/handstand_recipe.py (bootcamp -> braking ->
    # kick-up mix); annealing upright starts in too early erodes the
    # hold before it consolidates (doc/handstand_r4_notes.md).
    cfg.init_state.handstand_init_prob = 1.0
    cfg.init_state.handstand_init_prob_final = 1.0
    cfg.init_state.handstand_anneal_steps = 0
    cfg.init_state.handstand_mid_frac = 0.0
    # fallen-band termination grace (see _check_termination): long enough
    # to cross the sideways band during a kick-up from upright
    cfg.env.fallen_grace_s = 1.5
    # Contact-stiffness DR (r4 infrastructure, no reference analog):
    # available via DomainRandCfg.randomize_contact_stiffness, but OFF in
    # the shipped recipe. The x0.5-3.0 range collapsed training (the
    # policy stopped attempting kick-ups entirely, 0/16 vs 78%), and the
    # r4 diagnosis showed the r3 transfer failure was NOT contact
    # softness: the r3 RSI seeded holds in the statically unbalanceable
    # th>150 deg band, so no hold existed in ANY engine
    # (doc/handstand_r4_notes.md).
    # hold band: g_z 0.24-0.44, outside the fallen band with margin, and
    # the balance-corrected front thigh stays inside its -1.57 rad limit
    cfg.init_state.handstand_hold_th_deg = (104.0, 116.0)
    cfg.init_state.handstand_mid_th_deg = (40.0, 120.0)
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
        inversion_height=0.0,   # training-time shaping; campaign recipes only
        entry_lean=0.0,         # training-time shaping; campaign recipes only
        pre_inversion_crouch=0.0,  # training-time shaping (negative scale)
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
    # Lower exploration noise + entropy than the locomotion tasks: the
    # hold is an unstable equilibrium and sigma=1.0 action noise (0.3 rad
    # of target jitter) keeps knocking it over faster than PPO can learn
    # the recovery (r4 campaign, doc/handstand_r4_notes.md).
    t.policy.init_noise_std = 0.5
    t.algorithm.entropy_coef = 0.005
    t.runner.experiment_name = "go2_handstand"
    # single-run balance bootcamp; the shipped artifact uses the staged
    # recipe (scripts/handstand_recipe.py, 13.5k iters total)
    t.runner.max_iterations = 5000
    return t
