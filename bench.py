"""Benchmark: end-to-end PPO training throughput across the BASELINE configs.

Measures env-steps/s of the full jitted train iteration (24-step rollout +
GAE + 5x4 minibatch updates, everything on device) at the reference's
operating points (BASELINE.md / BASELINE.json configs):

  * go2          — flagship: 4096 envs, MLP [512,256,128], 200 Hz dec 4
  * g1           — humanoid: LSTM-64 recurrent policy (TBPTT update path)
  * h1           — BASELINE config #3: 19-DoF H1 humanoid, 10 actions, LSTM
  * h1_2         — 400 Hz sim dt 0.0025, decimation 8 (2x physics work)
  * go2_terrain  — heightfield terrain curriculum on the Pallas fast path
  * h1_2_terrain — BASELINE config #4 as written: H1_2 + terrain
                   curriculum + observation noise (noise is on in the
                   stock h1_2 cfg)
  * g1_terrain   — LSTM recurrent policy + terrain curriculum (the
                   "rough_g1" operating class)

Prints ONE JSON line: the flagship go2 metric, with the other configs under
``extra``. ``vs_baseline`` is relative to the Isaac-Gym-on-A100-class
throughput (~100k env-steps/s for legged tasks, PAPERS.md:9 / BASELINE.md);
the north-star target is >= 10x per chip.

Env knobs: BENCH_NUM_ENVS, BENCH_ITERS, BENCH_CONFIGS (comma list),
BENCH_BUDGET_S (soft wall-clock budget; remaining configs are skipped once
exceeded — compiles on the remote-compile service can be slow).
"""

import json
import os
import sys
import time

BASELINE = 100_000.0  # IsaacGym-A100-class env-steps/s (BASELINE.md)


def build(task, num_envs):
    import jax

    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.models import networks as nets
    from unitree_rl_gym_tpu.rl.ppo import PPO

    reg_name = task.removesuffix("_terrain")
    cfg, tcfg = task_registry.get_cfgs(reg_name)
    env_class = task_registry.get_task_class(reg_name)
    cfg.env.num_envs = num_envs
    if task.endswith("_terrain"):
        # BASELINE.json config #4 class: heightfield terrain curriculum
        cfg.terrain.mesh_type = "heightfield"
        cfg.terrain.curriculum = True
    env = env_class(cfg)
    pc = tcfg.policy
    pc._class_name = tcfg.runner.policy_class_name
    net = nets.build_network(pc, env.num_actions)
    alg = PPO(net=net, cfg=tcfg.algorithm,
              num_steps=tcfg.runner.num_steps_per_env, num_envs=num_envs,
              share_critic_obs=env.num_privileged_obs is None)
    ts = alg.init(jax.random.PRNGKey(0), env.num_obs,
                  env.num_privileged_obs or env.num_obs)
    env_state, obs = env.reset_all(jax.random.PRNGKey(1))
    cobs = env_state.priv_obs if env_state.priv_obs is not None else obs
    carry = net.initial_carry(num_envs)
    steps_per_iter = num_envs * tcfg.runner.num_steps_per_env

    @jax.jit
    def train_step(ts, env_state, obs, cobs, carry):
        return alg.train_iteration(env, ts, env_state, obs, cobs, carry)

    return train_step, (ts, env_state, obs, cobs, carry), steps_per_iter


def measure(task, num_envs, iters):
    import jax

    train_step, carry, steps_per_iter = build(task, num_envs)
    out = train_step(*carry)
    jax.block_until_ready(out)
    carry = out[:-1]

    t0 = time.time()
    for _ in range(iters):
        out = train_step(*carry)
        carry = out[:-1]
    jax.block_until_ready(out[2])
    dt = time.time() - t0
    return iters * steps_per_iter / dt


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    configs = os.environ.get(
        "BENCH_CONFIGS", "go2,g1,h1,h1_2,go2_terrain,h1_2_terrain,g1_terrain"
    ).split(",")
    budget = float(os.environ.get("BENCH_BUDGET_S", 2400))

    t_start = time.time()
    results = {}
    for task in configs:
        if results and time.time() - t_start > budget:
            print(f"[bench] budget exceeded, skipping {task}",
                  file=sys.stderr)
            continue
        try:
            results[task] = measure(task, num_envs, iters)
            print(f"[bench] {task}: {results[task]:.0f} env-steps/s",
                  file=sys.stderr)
        except Exception as e:
            print(f"[bench] {task} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    main_task = "go2" if "go2" in results else next(iter(results))
    v = results[main_task]
    extra = {
        f"{t}_train_env_steps_per_s": round(r, 1)
        for t, r in results.items() if t != main_task
    }
    print(json.dumps({
        "metric": f"{main_task}_train_env_steps_per_s",
        "value": round(v, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(v / BASELINE, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
