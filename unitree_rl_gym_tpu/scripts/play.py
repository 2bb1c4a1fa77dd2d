"""Evaluate + export a trained policy:
python -m unitree_rl_gym_tpu.scripts.play --task=go2

Reference: legged_gym/scripts/play.py — build a small eval env with
noise/DR/pushes off, load the latest checkpoint, export the policy, run an
inference loop and print aggregate rewards (utils/logger.py)."""

import os

import numpy as np

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.utils import helpers
from unitree_rl_gym_tpu.utils.logger import Logger

EXPORT_POLICY = True
NUM_STEPS = 500


def play(args):
    helpers.apply_platform(args)
    import jax
    import jax.numpy as jnp

    from unitree_rl_gym_tpu.envs.registry import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(name=args.task)
    # override for eval (play.py:18-26)
    env_cfg.env.num_envs = min(env_cfg.env.num_envs, 100)
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_contact_stiffness = False
    env_cfg.env.test = True

    env, _ = task_registry.make_env(name=args.task, args=args, env_cfg=env_cfg)
    train_cfg.runner.resume = True
    runner, train_cfg = task_registry.make_alg_runner(
        env=env, name=args.task, args=args, train_cfg=train_cfg
    )
    policy = runner.get_inference_policy()

    if EXPORT_POLICY:
        from unitree_rl_gym_tpu.export.export import export_policy
        path = os.path.join(
            UNITREE_RL_GYM_TPU_ROOT_DIR, "logs",
            train_cfg.runner.experiment_name, "exported", "policies",
        )
        export_policy(runner, path)
        print("Exported policy to:", path)

    # in-sim visualization + test-mode real-time pacing
    # (reference base_task.py:63-115 viewer; legged_robot.py:631-635 pacing)
    viewer = None
    if getattr(args, "view", False):
        from unitree_rl_gym_tpu.utils.viz import RolloutViewer
        viewer = RolloutViewer(
            args.task, env, realtime=env_cfg.env.test,
        )

    logger = Logger(env.dt)
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    falls = 0
    for i in range(NUM_STEPS):
        actions = policy(obs)
        state, obs, _, rew, done, extras = step(state, actions)
        if viewer is not None and not viewer.update(state):
            break
        n_resets = int(jax.device_get(extras["episode_reset_count"]))
        if n_resets:
            ep_sums = jax.device_get(extras["episode_sums_at_reset"])
            logger.log_rewards(
                {
                    f"rew_{n}": np.asarray(s / max(n_resets, 1))
                    for n, s in zip(env.episode_term_names, ep_sums)
                },
                n_resets,
            )
        if i > NUM_STEPS // 5:       # skip the settle-in window
            v = np.asarray(jax.device_get(state.phys.v))
            cmd = np.asarray(jax.device_get(state.commands))
            logger.log_states({
                "abs_vx_tracking_err": np.abs(v[:, 3] - cmd[:, 0]).mean(),
                "abs_vy_tracking_err": np.abs(v[:, 4] - cmd[:, 1]).mean(),
                "abs_yaw_rate_err": np.abs(v[:, 2] - cmd[:, 2]).mean(),
                "base_height": np.asarray(
                    jax.device_get(state.phys.base_pos[:, 2])
                ).mean(),
            })
            falls += int(np.asarray(jax.device_get(
                done & ~extras["time_outs"]
            )).sum())
    if viewer is not None:
        viewer.close()
    logger.print_rewards()
    logger.print_states()
    print(f"Non-timeout terminations: {falls}")


if __name__ == "__main__":
    play(helpers.get_args())
