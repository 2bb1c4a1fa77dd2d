"""Benchmark: Go2 training throughput on the flagship config.

Measures end-to-end PPO training env-steps/s (rollout + learner, everything
on device) at the reference's operating point: 4096 envs, 24-step rollouts,
200 Hz physics with decimation 4 (legged_robot_config.py:54, 226, 275).

Prints ONE JSON line. ``vs_baseline`` is relative to the Isaac-Gym-on-A100
class throughput (~100k env-steps/s for legged tasks, PAPERS.md:9 /
BASELINE.md) — the north-star target is >= 10x per chip.
"""

import json
import os
import sys
import time


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    import jax

    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg, go2_rough_train_cfg
    from unitree_rl_gym_tpu.models import networks as nets
    from unitree_rl_gym_tpu.rl.ppo import PPO

    cfg = go2_rough_cfg()
    cfg.env.num_envs = num_envs
    env = LeggedEnv(cfg)
    tcfg = go2_rough_train_cfg()
    net = nets.build_network(tcfg.policy, env.num_actions)
    alg = PPO(net=net, cfg=tcfg.algorithm,
              num_steps=tcfg.runner.num_steps_per_env, num_envs=num_envs)
    ts = alg.init(jax.random.PRNGKey(0), env.num_obs, env.num_obs)
    env_state, obs = env.reset_all(jax.random.PRNGKey(1))
    carry = net.initial_carry(num_envs)

    @jax.jit
    def train_step(ts, env_state, obs, cobs, carry):
        return alg.train_iteration(env, ts, env_state, obs, cobs, carry)

    # warmup / compile
    out = train_step(ts, env_state, obs, obs, carry)
    jax.block_until_ready(out)
    ts, env_state, obs, cobs, carry, _ = out

    t0 = time.time()
    for _ in range(iters):
        ts, env_state, obs, cobs, carry, metrics = train_step(
            ts, env_state, obs, cobs, carry
        )
    jax.block_until_ready(obs)
    dt = time.time() - t0

    env_steps = iters * num_envs * tcfg.runner.num_steps_per_env
    steps_per_s = env_steps / dt
    baseline = 100_000.0  # IsaacGym-A100-class env-steps/s (BASELINE.md)
    print(json.dumps({
        "metric": "go2_train_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
