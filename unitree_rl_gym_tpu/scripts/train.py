"""Train a task: python -m unitree_rl_gym_tpu.scripts.train --task=go2

Reference: legged_gym/scripts/train.py:11-14 — make_env, make_alg_runner,
runner.learn."""

from unitree_rl_gym_tpu.utils import helpers


def train(args):
    helpers.apply_platform(args)
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.parallel.mesh import (
        distributed_initialize_if_needed,
    )

    distributed_initialize_if_needed()

    env, env_cfg = task_registry.make_env(name=args.task, args=args)
    runner, train_cfg = task_registry.make_alg_runner(
        env=env, name=args.task, args=args
    )
    runner.learn(
        num_learning_iterations=train_cfg.runner.max_iterations,
        init_at_random_ep_len=True,
    )


if __name__ == "__main__":
    train(helpers.get_args())
