"""Map the hold basin of attraction over mid-transition states.

Resets every env MID-KICK-UP (RSI mid states: planted front feet, trunk
pitched th with pitch rate w toward inversion) and runs the
deterministic policy, then bins the outcome by the *initial* (th, w)
read back from the first-step state. Answers the r5 conversion
question from the other side: the arrival diagnostics
(handstand_diag.py) showed WHERE the policy's own kick-ups arrive
(10-17 rad/s); this shows FROM WHERE the policy can actually brake
into a >= 3 s hold. If the basin is empty even at low w, the braking
drill never taught braking; if a basin exists but excludes the
arrival envelope, the kick itself must be slowed/shaped into the
basin (doc/handstand_r5_notes.md).

    python -m unitree_rl_gym_tpu.scripts.handstand_basin \
        [--src <artifact>] [--envs 256] [--w 1 14] [--th 40 140]
"""

import argparse
import json

import numpy as np


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.export.export import load_flat_params
    from unitree_rl_gym_tpu.models import networks as nets
    from unitree_rl_gym_tpu.scripts.handstand_kickup_r5 import ART
    from unitree_rl_gym_tpu.utils import math as tm

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=ART)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=450)
    ap.add_argument("--w", type=float, nargs=2, default=(1.0, 14.0))
    ap.add_argument("--th", type=float, nargs=2, default=(40.0, 140.0))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg, tcfg = task_registry.get_cfgs("go2_handstand")
    cfg.env.num_envs = args.envs
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.env.test = True
    cfg.init_state.handstand_init_prob = 1.0
    cfg.init_state.handstand_init_prob_final = 1.0
    cfg.init_state.handstand_mid_frac = 1.0
    cfg.init_state.handstand_mid_th_deg = tuple(args.th)
    cfg.init_state.handstand_mid_w = tuple(args.w)
    env = task_registry.get_task_class("go2_handstand")(cfg)

    tcfg.policy._class_name = tcfg.runner.policy_class_name
    net = nets.build_network(tcfg.policy, 12).clone(dtype="float32")
    params = load_flat_params(args.src)

    th_lo = cfg.init_state.handstand_hold_th_deg[0]
    pgz_th = float(-np.cos(np.deg2rad(th_lo)) - 0.01)

    def rollout(params, seed):
        state, obs = env.reset_all(jax.random.PRNGKey(seed))
        # initial pitch/rate straight from the post-reset physics state
        gz0 = jax.vmap(
            lambda q: tm.quat_rotate_inverse(
                q, jnp.asarray([0.0, 0.0, -1.0])
            )
        )(state.phys.base_quat)[:, 2]
        w0 = state.phys.v[:, 1]          # body pitch rate

        def body(c, _):
            state, obs, carry = c
            mu, carry = net.apply(params, obs, carry, method=net.act)
            state, obs, _, _, done, _ = env.step(state, mu)
            pgz = jax.vmap(
                lambda q: tm.quat_rotate_inverse(
                    q, jnp.asarray([0.0, 0.0, -1.0])
                )
            )(state.phys.base_quat)[:, 2]
            h = state.phys.base_pos[:, 2]
            return (state, obs, carry), (done, pgz, h)

        carry0 = net.initial_carry(args.envs)
        _, (done, pgz, h) = jax.lax.scan(
            body, (state, obs, carry0), None, length=args.steps
        )
        return gz0, w0, done, pgz, h

    gz0, w0, done, pgz, h = jax.jit(rollout)(params, args.seed)
    gz0, w0 = np.asarray(gz0), np.asarray(w0)
    done = np.asarray(done)
    ok = (~done) & (np.asarray(pgz) > pgz_th) & (np.asarray(h) > 0.3)
    run = np.zeros(args.envs)
    best = np.zeros(args.envs)
    for t in range(ok.shape[0]):
        run = np.where(ok[t], run + 1, 0)
        best = np.maximum(best, run)
    th0 = np.rad2deg(np.arccos(np.clip(-gz0, -1.0, 1.0)))
    held = best >= 120          # 3 s

    th_bins = [40, 70, 90, 110, 125, 140]
    w_bins = [0, 2, 4, 6, 8, 11, 14.5]
    grid = {}
    for i in range(len(th_bins) - 1):
        for j in range(len(w_bins) - 1):
            m = (
                (th0 >= th_bins[i]) & (th0 < th_bins[i + 1])
                & (w0 >= w_bins[j]) & (w0 < w_bins[j + 1])
            )
            if m.sum() == 0:
                continue
            grid[f"th{th_bins[i]}-{th_bins[i+1]} w{w_bins[j]}-{w_bins[j+1]}"] = (
                f"{held[m].mean():.2f} ({int(m.sum())})"
            )
    print(f"overall hold-from-mid rate: {held.mean():.3f} "
          f"({int(held.sum())}/{args.envs})")
    for k in sorted(grid):
        print(f"  {k}: {grid[k]}")
    print(json.dumps(dict(src=args.src, rate=float(held.mean()),
                          grid=grid)))


if __name__ == "__main__":
    main()
