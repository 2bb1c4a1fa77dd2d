"""Reward term library — pure functions over a per-step context.

Every term replicates, number for number, a ``_reward_*`` method of the
reference (base terms: legged_robot.py:843-939; humanoid terms:
g1_env.py:144-180; handstand terms: go2_handstand_env.py:224-383). Terms are
batched over envs ([N] outputs) and selected/scaled at env-build time from
``cfg.rewards.scales`` exactly like ``_prepare_reward_function``
(legged_robot.py:817-840): zero scales pruned, non-zero scales multiplied
by the control dt.

The context ``ctx`` is a plain namespace assembled by the env's step
(envs/base_env.py) holding the post-physics tensors of the current step.
Stateful terms (feet_air_time) receive their precomputed inputs via ctx —
the state updates themselves live in the env step so they stay fused with
the reset masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Base LeggedRobot terms (legged_robot.py:843-939)
# ---------------------------------------------------------------------------


def lin_vel_z(ctx):
    return jnp.square(ctx.base_lin_vel[:, 2])


def ang_vel_xy(ctx):
    return jnp.sum(jnp.square(ctx.base_ang_vel[:, :2]), axis=1)


def orientation(ctx):
    return jnp.sum(jnp.square(ctx.projected_gravity[:, :2]), axis=1)


def base_height(ctx):
    return jnp.square(ctx.base_pos[:, 2] - ctx.cfg.rewards.base_height_target)


def torques(ctx):
    return jnp.sum(jnp.square(ctx.torques), axis=1)


def dof_vel(ctx):
    return jnp.sum(jnp.square(ctx.dof_vel), axis=1)


def dof_acc(ctx):
    return jnp.sum(
        jnp.square((ctx.last_dof_vel - ctx.dof_vel) / ctx.dt), axis=1
    )


def action_rate(ctx):
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions), axis=1)


def collision(ctx):
    force = jnp.linalg.norm(
        ctx.contact_forces[:, ctx.penalised_contact_indices, :], axis=-1
    )
    return jnp.sum(1.0 * (force > 0.1), axis=1)


def termination(ctx):
    return (ctx.reset_buf & ~ctx.time_out_buf).astype(jnp.float32)


def dof_pos_limits(ctx):
    # soft limits precomputed into ctx.dof_pos_soft_lo/hi (legged_robot.py:466-469)
    out = -jnp.clip(ctx.dof_pos - ctx.dof_pos_soft_lo, None, 0.0)
    out = out + jnp.clip(ctx.dof_pos - ctx.dof_pos_soft_hi, 0.0, None)
    return jnp.sum(out, axis=1)


def dof_vel_limits(ctx):
    lim = ctx.dof_vel_limits * ctx.cfg.rewards.soft_dof_vel_limit
    return jnp.sum(
        jnp.clip(jnp.abs(ctx.dof_vel) - lim, 0.0, 1.0), axis=1
    )


def torque_limits(ctx):
    lim = ctx.torque_limits * ctx.cfg.rewards.soft_torque_limit
    return jnp.sum(jnp.clip(jnp.abs(ctx.torques) - lim, 0.0, None), axis=1)


def tracking_lin_vel(ctx):
    err = jnp.sum(
        jnp.square(ctx.commands[:, :2] - ctx.base_lin_vel[:, :2]), axis=1
    )
    return jnp.exp(-err / ctx.cfg.rewards.tracking_sigma)


def tracking_ang_vel(ctx):
    err = jnp.square(ctx.commands[:, 2] - ctx.base_ang_vel[:, 2])
    return jnp.exp(-err / ctx.cfg.rewards.tracking_sigma)


def feet_air_time(ctx):
    """Reward long steps; ctx supplies first_contact / feet_air_time computed
    with the PhysX-debounce filter (legged_robot.py:912-923)."""
    rew = jnp.sum(
        (ctx.feet_air_time - 0.5) * ctx.first_contact, axis=1
    )
    return rew * (jnp.linalg.norm(ctx.commands[:, :2], axis=1) > 0.1)


def feet_stumble(ctx):
    fxy = jnp.linalg.norm(
        ctx.contact_forces[:, ctx.feet_indices, :2], axis=2
    )
    fz = jnp.abs(ctx.contact_forces[:, ctx.feet_indices, 2])
    return jnp.any(fxy > 5.0 * fz, axis=1).astype(jnp.float32)


def stand_still(ctx):
    return jnp.sum(
        jnp.abs(ctx.dof_pos - ctx.default_dof_pos), axis=1
    ) * (jnp.linalg.norm(ctx.commands[:, :2], axis=1) < 0.1)


def feet_contact_forces(ctx):
    f = jnp.linalg.norm(ctx.contact_forces[:, ctx.feet_indices, :], axis=-1)
    return jnp.sum(
        jnp.clip(f - ctx.cfg.rewards.max_contact_force, 0.0, None), axis=1
    )


def stumble(ctx):  # alias used by handstand cfg scales (go2_handstand_config.py:131)
    return feet_stumble(ctx)


# ---------------------------------------------------------------------------
# Humanoid terms (g1_env.py:144-180, shared by H1/H1_2)
# ---------------------------------------------------------------------------


def contact(ctx):
    """Phase-contact match: stance iff leg phase < 0.55 (g1_env.py:144-152)."""
    is_stance = ctx.leg_phase < 0.55                              # [N, 2]
    in_contact = ctx.contact_forces[:, ctx.feet_indices, 2] > 1.0
    match = ~(in_contact ^ is_stance)
    return jnp.sum(match.astype(jnp.float32), axis=1)


def feet_swing_height(ctx):
    c = jnp.linalg.norm(
        ctx.contact_forces[:, ctx.feet_indices, :3], axis=2
    ) > 1.0
    err = jnp.square(ctx.feet_pos[:, :, 2] - 0.08) * (~c)
    return jnp.sum(err, axis=1)


def alive(ctx):
    return jnp.ones(ctx.num_envs)


def contact_no_vel(ctx):
    c = jnp.linalg.norm(
        ctx.contact_forces[:, ctx.feet_indices, :3], axis=2
    ) > 1.0
    v = ctx.feet_vel * c[..., None]
    return jnp.sum(jnp.square(v), axis=(1, 2))


def hip_pos(ctx):
    return jnp.sum(jnp.square(ctx.dof_pos[:, ctx.hip_indices]), axis=1)


# ---------------------------------------------------------------------------
# Go2 handstand terms (go2_handstand_env.py:224-383)
# ---------------------------------------------------------------------------


def hs_orientation(ctx):
    g_z = jnp.clip(ctx.projected_gravity[:, 2], -1.0, 1.0)
    err = 1.0 - g_z
    return jnp.exp(-3.0 * err * err)


def hs_base_height(ctx):
    err = jnp.clip(
        ctx.cfg.rewards.base_height_target - ctx.base_pos[:, 2], 0.0, None
    )
    return jnp.exp(-8.0 * err * err)


def inversion_height(ctx):
    """Training-time shaping (no reference analog; scale 0 in the stock
    config): the PRODUCT of the inverted-orientation bell and the
    base-height bell. The r5 arrival diagnostics showed the kick-up
    policy learns a ground-level flip — near-perfect inversion (peak
    g_z 0.98) at base height 0.13-0.21 m, where every attempt dies by
    illegal contact — because the flat `orientation` term pays the same
    for inversion at any height. This term only pays for inversion
    ACHIEVED HIGH, making the press-up strictly more profitable than
    the face-roll (doc/handstand_r5_notes.md finding 4)."""
    return hs_orientation(ctx) * hs_base_height(ctx)


def entry_lean(ctx):
    """Training-time shaping (no reference analog; scale 0 in the stock
    config): a MONOTONE planted-pivot ramp for the kick-up ENTRY.

    The r5 basin probe (doc/handstand_r5_notes.md finding 5) proved the
    brake/press skill is complete — 87.5% of planted mid-transition
    states across th 40-140 deg x w 1-14 rad/s convert to >= 3 s holds —
    and localized the single broken link to upright stance -> planted
    ~40 deg lean. The working hypothesis for why five recipes failed to
    close it: the multi-step CoM-shift has NO reward gradient under the
    stock terms until the lean is substantial (`inversion_height` only
    pays once inverted AND high), while the dive-flip alternative is
    reachable in 2-3 actions. This term supplies the missing gradient:

      pay = sqrt(th / 110 deg) * front_planted * height_gate

    * th = arccos(-g_z), the tilt off vertical: 0 upright -> pi
      inverted. arccos is steep near g_z = -1, so the FIRST degrees of
      lean already move the reward — exactly where exploration from a
      standing policy needs signal.  sqrt steepens it further.
    * front_planted gates on the front feet carrying load, so only the
      pivot-over-planted-feet path pays (the r3 lesson: airborne
      braking practice transfers nothing).
    * height_gate (sigmoid at 0.235 m) separates the legitimate pivot
      from the dive-flip with measured margin: the planted-pivot FK path
      never drops below 0.258 m (mid-table, th 30-150 deg) while the
      dive's base sits at 0.13-0.21 m (r5 arrival diagnostics) — the
      flip earns ~0 here at any inversion.
    Monotone to a plateau at th >= 110 deg, so there is always gradient
    toward the hold band and no partial-lean optimum from this term
    alone (the hold itself out-pays the plateau via pose/contact terms).
    """
    gz = jnp.clip(ctx.projected_gravity[:, 2], -1.0, 1.0)
    th = jnp.arccos(-gz)
    ramp = jnp.sqrt(jnp.clip(th / jnp.deg2rad(110.0), 0.0, 1.0))
    front = (ctx.contact_forces[:, ctx.front_feet_indices, 2] > 5.0)
    planted = jnp.mean(front.astype(jnp.float32), axis=1)
    hgate = jax.nn.sigmoid((ctx.base_pos[:, 2] - 0.235) / 0.015)
    return ramp * planted * hgate


def pre_inversion_crouch(ctx):
    """Penalty shaping, use with a NEGATIVE scale (no reference analog;
    scale 0 in the stock config): depth of the base below 0.235 m while
    in the TRANSITION region (-0.8 < g_z < 0.15, two-sided sigmoid
    gate). Rationale (r5): the dive-flip is the policy's deterministic
    primitive from upright — per-step sigma noise never finds the
    multi-step planted rock, so instead of waiting for exploration this
    term creates a gradient that lifts the existing flip a little every
    update (its base sweeps 0.13-0.21 m through exactly this gate)
    until it becomes a tall pivot, which the press basin catches
    (94% conversion from planted leans, E13). The legitimate pivot
    path never dips below 0.258 m (FK mid-table) and upright idle
    (g_z ~ -1) and the hold band (g_z >= 0.24) are outside the gate, so
    neither pays."""
    gz = ctx.projected_gravity[:, 2]
    depth = jnp.clip(0.235 - ctx.base_pos[:, 2], 0.0, None)
    gate = jax.nn.sigmoid((0.15 - gz) / 0.05) * jax.nn.sigmoid(
        (gz + 0.8) / 0.05
    )
    return depth * gate


def front_feet_contact(ctx):
    c = (ctx.contact_forces[:, ctx.front_feet_indices, 2] > 5.0).astype(
        jnp.float32
    )
    return jnp.mean(c, axis=1)


def hind_feet_no_contact(ctx):
    c = (ctx.contact_forces[:, ctx.hind_feet_indices, 2] > 5.0).astype(
        jnp.float32
    )
    return 1.0 - jnp.mean(c, axis=1)


def pose(ctx):
    err = ctx.dof_pos - ctx.pose_targets
    sq = jnp.sum(jnp.square(err[:, ctx.front_dof_idx]), axis=1) + 0.3 * jnp.sum(
        jnp.square(err[:, ctx.rear_dof_idx]), axis=1
    )
    return jnp.exp(-4.0 * sq)


def stability(ctx):
    lin = jnp.linalg.norm(ctx.base_lin_vel[:, :2], axis=1)
    ang = jnp.linalg.norm(ctx.base_ang_vel[:, :2], axis=1)
    return jnp.exp(-2.0 * (lin + 0.5 * ang))


def energy(ctx):
    return jnp.sum(jnp.abs(ctx.torques) * jnp.abs(ctx.dof_vel), axis=1)


def front_hip_neutral(ctx):
    hip = ctx.dof_pos[:, ctx.front_hip_idx]
    return jnp.exp(-4.0 * jnp.sum(jnp.square(hip), axis=1))


def front_feet_together(ctx):
    fl = ctx.feet_pos[:, 0, :2]
    fr = ctx.feet_pos[:, 1, :2]
    dist = jnp.linalg.norm(fl - fr, axis=1)
    err = jnp.clip(dist - 0.12, 0.0, None)
    return jnp.exp(-20.0 * err * err)


def stay_still(ctx):
    lin = jnp.linalg.norm(ctx.base_lin_vel[:, :2], axis=1)
    yaw = jnp.abs(ctx.base_ang_vel[:, 2])
    return jnp.exp(-((lin / 0.05) ** 2) - (yaw / 0.2) ** 2)


def lin_vel_xy(ctx):
    return jnp.linalg.norm(ctx.base_lin_vel[:, :2], axis=1)


# term name -> fn registries per env family
BASE_REWARDS = dict(
    lin_vel_z=lin_vel_z,
    ang_vel_xy=ang_vel_xy,
    orientation=orientation,
    base_height=base_height,
    torques=torques,
    dof_vel=dof_vel,
    dof_acc=dof_acc,
    action_rate=action_rate,
    collision=collision,
    termination=termination,
    dof_pos_limits=dof_pos_limits,
    dof_vel_limits=dof_vel_limits,
    torque_limits=torque_limits,
    tracking_lin_vel=tracking_lin_vel,
    tracking_ang_vel=tracking_ang_vel,
    feet_air_time=feet_air_time,
    feet_stumble=feet_stumble,
    stumble=stumble,
    stand_still=stand_still,
    feet_contact_forces=feet_contact_forces,
)

HUMANOID_REWARDS = dict(
    BASE_REWARDS,
    contact=contact,
    feet_swing_height=feet_swing_height,
    alive=alive,
    contact_no_vel=contact_no_vel,
    hip_pos=hip_pos,
)

HANDSTAND_REWARDS = dict(
    BASE_REWARDS,
    # handstand overrides orientation/base_height with exp-shaped versions
    orientation=hs_orientation,
    base_height=hs_base_height,
    inversion_height=inversion_height,
    entry_lean=entry_lean,
    pre_inversion_crouch=pre_inversion_crouch,
    front_feet_contact=front_feet_contact,
    hind_feet_no_contact=hind_feet_no_contact,
    pose=pose,
    stability=stability,
    energy=energy,
    front_hip_neutral=front_hip_neutral,
    front_feet_together=front_feet_together,
    stay_still=stay_still,
    lin_vel_xy=lin_vel_xy,
)
