"""CLI args, seeding, checkpoint discovery (reference: utils/helpers.py).

Keeps the reference's flag surface (README.md:47-59) minus the Isaac-Gym
device plumbing, plus TPU-relevant additions (--platform)."""

from __future__ import annotations

import argparse
import os
import random
from typing import Optional

import numpy as np


def set_seed(seed: Optional[int]):
    """Seed host RNGs (helpers.py:37-47). Device-side randomness is
    jax.random keyed from cfg.seed; this covers numpy/python host code."""
    if seed is None or seed == -1:
        seed = np.random.randint(0, 10000)
    print(f"Setting seed: {seed}")
    random.seed(seed)
    np.random.seed(seed)
    return seed


def get_load_path(root, load_run=-1, checkpoint=-1):
    """Latest-run / latest-checkpoint discovery (helpers.py:73-95), adapted
    to ``model_<it>.ckpt`` files."""
    try:
        runs = os.listdir(root)
        runs.sort()
        if "exported" in runs:
            runs.remove("exported")
        last_run = os.path.join(root, runs[-1])
    except Exception:
        raise ValueError("No runs in this directory: " + root)
    if load_run == -1:
        load_run = last_run
    else:
        load_run = os.path.join(root, str(load_run))

    if checkpoint == -1:
        models = [
            f for f in os.listdir(load_run)
            if "model" in f and f.endswith(".ckpt")
        ]
        # numeric sort on the iteration (the reference's zero-pad string
        # trick, helpers.py:88, breaks once filename lengths differ)
        models.sort(key=lambda m: int(m.split("_")[1].split(".")[0]))
        model = models[-1]
    else:
        model = f"model_{checkpoint}.ckpt"
    return os.path.join(load_run, model)


def update_cfg_from_args(env_cfg, train_cfg, args):
    """Apply CLI overrides (helpers.py:97-120)."""
    if env_cfg is not None:
        if getattr(args, "num_envs", None) is not None:
            env_cfg.env.num_envs = args.num_envs
        if getattr(args, "seed", None) is not None:
            env_cfg.seed = args.seed
    if train_cfg is not None:
        if getattr(args, "seed", None) is not None:
            train_cfg.seed = args.seed
        if getattr(args, "max_iterations", None) is not None:
            train_cfg.runner.max_iterations = args.max_iterations
        if getattr(args, "resume", False):
            train_cfg.runner.resume = args.resume
        if getattr(args, "experiment_name", None) is not None:
            train_cfg.runner.experiment_name = args.experiment_name
        if getattr(args, "run_name", None) is not None:
            train_cfg.runner.run_name = args.run_name
        if getattr(args, "load_run", None) is not None:
            train_cfg.runner.load_run = args.load_run
        if getattr(args, "checkpoint", None) is not None:
            train_cfg.runner.checkpoint = args.checkpoint
    return env_cfg, train_cfg


def get_args(argv=None):
    """CLI surface of the reference train/play scripts (helpers.py:122-148),
    with --platform for TPU/CPU selection instead of sim/rl device flags."""
    p = argparse.ArgumentParser(description="RL Policy (TPU-native)")
    p.add_argument("--task", type=str, default="go2")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--experiment_name", type=str)
    p.add_argument("--run_name", type=str)
    p.add_argument("--load_run", type=str)
    p.add_argument("--checkpoint", type=int)
    p.add_argument("--headless", action="store_true", default=False)
    p.add_argument("--num_envs", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--max_iterations", type=int)
    p.add_argument(
        "--view", action="store_true", default=False,
        help="replay the rollout in a MuJoCo passive viewer (play only)",
    )
    p.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (cpu|tpu|axon); default = jax's choice",
    )
    p.add_argument(
        "--host_devices", type=int, default=None,
        help="virtual CPU device count (testing multi-chip sharding)",
    )
    return p.parse_args(argv)


def apply_platform(args):
    """Force the requested jax platform before any backend initializes."""
    if getattr(args, "host_devices", None):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}"
        )
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
