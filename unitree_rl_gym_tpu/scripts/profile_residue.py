"""Decompose the go2 rollout's in-scan residue (doc/profile_r4.md
finding 3: ~2.5 ms of the 25.6 ms iteration is in-scan work around the
physics kernel). Measures, at the flagship operating point:

  A  full train iteration            (the bench.py program)
  B  rollout only                    (24-step scan, policy + env)
  C  rollout, constant actions       (env machinery only, no policy)
  D  rollout, constant actions,
     noise off                       (C minus the obs-noise RNG)
  E  kernel-only scan                (24 x control_step, nothing else)

policy cost   = B - C
obs-noise RNG = C - D
env residue   = D - E   (obs build, rewards, resets, commands, transposes)
update+GAE    = A - B

Prints one JSON object. Run on the TPU:
    python -m unitree_rl_gym_tpu.scripts.profile_residue [--task go2]
"""

import argparse
import json
import time


def timeit(fn, args, iters=20):
    import jax
    import numpy as np

    def fetch(out):
        # force completion with a 1-element host fetch:
        # jax.block_until_ready does not reliably await device completion
        # on the axon-tunneled backend (scripts/roofline.py methodology
        # note; the difference is invisible for big chained programs but
        # catastrophic for small probes)
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0:1])

    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="go2")
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.models import networks as nets
    from unitree_rl_gym_tpu.rl.ppo import PPO

    # ---- A: full iteration (bench program) ----
    train_step, carry, spi = bench.build(args.task, args.num_envs)
    ms_a = timeit(train_step, carry, args.iters)

    # rebuild the pieces (same configs as bench.build, incl. the
    # bench's _terrain suffix convention)
    reg_name = args.task.removesuffix("_terrain")
    cfg, tcfg = task_registry.get_cfgs(reg_name)
    cfg.env.num_envs = args.num_envs
    if args.task.endswith("_terrain"):
        cfg.terrain.mesh_type = "heightfield"
        cfg.terrain.curriculum = True
    env = task_registry.get_task_class(reg_name)(cfg)
    pc = tcfg.policy
    pc._class_name = tcfg.runner.policy_class_name
    net = nets.build_network(pc, env.num_actions)
    alg = PPO(net=net, cfg=tcfg.algorithm,
              num_steps=tcfg.runner.num_steps_per_env,
              num_envs=args.num_envs,
              share_critic_obs=env.num_privileged_obs is None)
    ts = alg.init(jax.random.PRNGKey(0), env.num_obs,
                  env.num_privileged_obs or env.num_obs)
    env_state, obs = env.reset_all(jax.random.PRNGKey(1))
    cobs = env_state.priv_obs if env_state.priv_obs is not None else obs
    carry0 = net.initial_carry(args.num_envs)

    # ---- B: rollout only ----
    @jax.jit
    def rollout_only(ts, env_state, obs, cobs, carry):
        out = alg.rollout(ts, env, env_state, obs, cobs, carry)
        return out[0], out[1]

    ms_b = timeit(rollout_only, (ts, env_state, obs, cobs, carry0),
                  args.iters)

    # ---- C: constant actions (no policy in the scan) ----
    @jax.jit
    def env_only(env_state, obs):
        def step_fn(c, _):
            env_state, obs = c
            env_state, next_obs, _, rew, done, extras = env.step(
                env_state, jnp.zeros((args.num_envs, env.num_actions)),
                refresh_terrain=False,
            )
            return (env_state, next_obs), rew

        c, rews = jax.lax.scan(
            step_fn, (env_state, obs), None, length=alg.num_steps
        )
        return c[0], rews

    ms_c = timeit(env_only, (env_state, obs), args.iters)

    # ---- D: constant actions, noise off ----
    cfg2, _ = task_registry.get_cfgs(reg_name)
    cfg2.env.num_envs = args.num_envs
    if args.task.endswith("_terrain"):
        cfg2.terrain.mesh_type = "heightfield"
        cfg2.terrain.curriculum = True
    cfg2.noise.add_noise = False
    env_nn = task_registry.get_task_class(reg_name)(cfg2)
    es2, obs2 = env_nn.reset_all(jax.random.PRNGKey(1))

    @jax.jit
    def env_only_nn(env_state, obs):
        def step_fn(c, _):
            env_state, obs = c
            env_state, next_obs, _, rew, done, extras = env_nn.step(
                env_state, jnp.zeros((args.num_envs, env_nn.num_actions)),
                refresh_terrain=False,
            )
            return (env_state, next_obs), rew

        c, rews = jax.lax.scan(
            step_fn, (env_state, obs), None, length=alg.num_steps
        )
        return c[0], rews

    ms_d = timeit(env_only_nn, (es2, obs2), args.iters)

    # ---- E: kernel-only scan ----
    from unitree_rl_gym_tpu.physics import backend as pback

    model, cp, pd = env.robot.dyn, env.cparams, env.pd
    tgt = jnp.tile(env.default_dof_pos, (args.num_envs, 1))
    fric = jnp.ones((args.num_envs,))
    mass = jnp.ones((args.num_envs,))

    @jax.jit
    def kernel_only(phys):
        def step_fn(phys, _):
            phys, aux = pback.control_step(
                model, cp, pd, cfg.sim.dt, cfg.control.decimation, phys,
                tgt, fric, mass, env.m_eff_n, env.m_eff_t,
            )
            return phys, aux["torques"][:, 0]

        phys, taus = jax.lax.scan(step_fn, phys, None, length=alg.num_steps)
        return phys, taus

    ms_e = timeit(kernel_only, (env_state.phys,), args.iters)

    out = {
        "task": args.task,
        "num_envs": args.num_envs,
        "A_full_iter_ms": round(ms_a, 2),
        "B_rollout_ms": round(ms_b, 2),
        "C_env_scan_ms": round(ms_c, 2),
        "D_env_scan_no_noise_ms": round(ms_d, 2),
        "E_kernel_scan_ms": round(ms_e, 2),
        "policy_ms": round(ms_b - ms_c, 2),
        "obs_noise_rng_ms": round(ms_c - ms_d, 2),
        "env_residue_ms": round(ms_d - ms_e, 2),
        "update_gae_ms": round(ms_a - ms_b, 2),
        "env_steps_per_s": round(spi / ms_a * 1e3, 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
