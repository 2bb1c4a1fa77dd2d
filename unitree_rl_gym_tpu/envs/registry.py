"""Task registry (reference: utils/task_registry.py).

Same surface: ``task_registry.register(name, task_class, env_cfg,
train_cfg)``, ``make_env(name, args, env_cfg)``, ``make_alg_runner(env,
name, args, train_cfg, log_root)``; the same five tasks are registered at
import (envs/__init__.py:21-27): go2, h1, h1_2, g1, go2_handstand."""

from __future__ import annotations

import os
from datetime import datetime
from typing import Callable, Dict, Optional, Tuple, Type

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner
from unitree_rl_gym_tpu.utils import helpers
from unitree_rl_gym_tpu.utils.config import LeggedRobotCfg, TrainCfg


class TaskRegistry:
    def __init__(self):
        self.task_classes: Dict[str, Type[LeggedEnv]] = {}
        self.env_cfgs: Dict[str, Callable[[], LeggedRobotCfg]] = {}
        self.train_cfgs: Dict[str, Callable[[], TrainCfg]] = {}

    def register(self, name, task_class, env_cfg_fn, train_cfg_fn):
        self.task_classes[name] = task_class
        self.env_cfgs[name] = env_cfg_fn
        self.train_cfgs[name] = train_cfg_fn

    def get_task_class(self, name) -> Type[LeggedEnv]:
        return self.task_classes[name]

    def get_cfgs(self, name) -> Tuple[LeggedRobotCfg, TrainCfg]:
        env_cfg = self.env_cfgs[name]()
        train_cfg = self.train_cfgs[name]()
        env_cfg.seed = train_cfg.seed      # task_registry.py:33-34
        return env_cfg, train_cfg

    def make_env(self, name, args=None, env_cfg=None):
        """Build the env for a task; CLI args override cfg
        (task_registry.py:37-74)."""
        if args is None:
            args = helpers.get_args()
        if name not in self.task_classes:
            raise ValueError(f"Task with name: {name} was not registered")
        task_class = self.get_task_class(name)
        if env_cfg is None:
            env_cfg, _ = self.get_cfgs(name)
        env_cfg, _ = helpers.update_cfg_from_args(env_cfg, None, args)
        helpers.set_seed(env_cfg.seed)
        env = task_class(env_cfg)
        return env, env_cfg

    def make_alg_runner(self, env, name=None, args=None, train_cfg=None,
                        log_root="default"):
        """Build the PPO runner + log dir (task_registry.py:76-127)."""
        if args is None:
            args = helpers.get_args()
        if train_cfg is None:
            if name is None:
                raise ValueError("Either 'name' or 'train_cfg' must be not None")
            _, train_cfg = self.get_cfgs(name)
        _, train_cfg = helpers.update_cfg_from_args(None, train_cfg, args)

        if log_root == "default":
            log_root = os.path.join(
                UNITREE_RL_GYM_TPU_ROOT_DIR, "logs",
                train_cfg.runner.experiment_name,
            )
            log_dir = os.path.join(
                log_root,
                datetime.now().strftime("%b%d_%H-%M-%S")
                + "_" + train_cfg.runner.run_name,
            )
        elif log_root is None:
            log_dir = None
        else:
            log_dir = os.path.join(
                log_root,
                datetime.now().strftime("%b%d_%H-%M-%S")
                + "_" + train_cfg.runner.run_name,
            )

        runner = OnPolicyRunner(env, train_cfg, log_dir)
        if train_cfg.runner.resume:
            resume_path = helpers.get_load_path(
                log_root, load_run=train_cfg.runner.load_run,
                checkpoint=train_cfg.runner.checkpoint,
            )
            print(f"Loading model from: {resume_path}")
            runner.load(resume_path)
        return runner, train_cfg


task_registry = TaskRegistry()


def _register_all():
    from unitree_rl_gym_tpu.envs import g1, go2, go2_handstand, h1, h1_2
    from unitree_rl_gym_tpu.envs.humanoid import G1Env, H1Env, H1_2Env

    task_registry.register(
        "go2", LeggedEnv, go2.go2_rough_cfg, go2.go2_rough_train_cfg
    )
    task_registry.register(
        "h1", H1Env, h1.h1_rough_cfg, h1.h1_rough_train_cfg
    )
    task_registry.register(
        "h1_2", H1_2Env, h1_2.h1_2_rough_cfg, h1_2.h1_2_rough_train_cfg
    )
    task_registry.register(
        "g1", G1Env, g1.g1_rough_cfg, g1.g1_rough_train_cfg
    )
    task_registry.register(
        "go2_handstand",
        go2_handstand.GO2HandstandEnv,
        go2_handstand.go2_handstand_cfg,
        go2_handstand.go2_handstand_train_cfg,
    )


_register_all()
