"""Train a task at its reference operating point and check the results into
``resources/pre_train/<task>/`` — policy artifacts (flat npz + meta +
policy.bin + TorchScript) plus the reward-vs-iteration ``curves.json``.

This is the producer of the repo's golden policy fixtures (the analog of
the reference's ``deploy/pre_train/*/motion.pt``, SURVEY.md §4), run once
per task on TPU:

    python -m unitree_rl_gym_tpu.scripts.make_pretrain --task=go2

Options: all of train.py's flags; --out to override the artifact dir.
"""

import os
import shutil

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.utils import helpers


def make_pretrain(args, out_dir=None):
    helpers.apply_platform(args)
    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.export.export import export_policy
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

    out_dir = out_dir or os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR, "resources", "pre_train", args.task
    )
    os.makedirs(out_dir, exist_ok=True)
    export_policy(runner, out_dir)
    if runner.log_dir:
        curves = os.path.join(runner.log_dir, "curves.json")
        if os.path.exists(curves):
            shutil.copy(curves, os.path.join(out_dir, "curves.json"))
    print(f"[make_pretrain] artifacts written to {out_dir}")
    return out_dir


if __name__ == "__main__":
    make_pretrain(helpers.get_args())
