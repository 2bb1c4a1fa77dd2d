"""unitree_rl_gym_tpu — TPU-native legged-robot RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``unitree_rl_gym`` (Isaac Gym + rsl_rl + Unitree deploy stack): batched
articulated physics, PPO training, task registry, policy export and deploy
pipelines — designed SPMD-first for TPU device meshes.

Path constants mirror the reference package root constants
(legged_gym/__init__.py:3-4).
"""

import os

# fp32 matmuls everywhere: XLA's default TPU matmul precision computes in
# bf16, which silently degrades the 3x3 rotation chains and contact
# geometry (mm-scale penetrations) and breaks the fixed-seed fp32
# reproducibility contract (BASELINE.md). The physics is bandwidth-bound at
# these shapes, so the cost is negligible.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

UNITREE_RL_GYM_TPU_ROOT_DIR = os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
UNITREE_RL_GYM_TPU_ENVS_DIR = os.path.join(
    UNITREE_RL_GYM_TPU_ROOT_DIR, "unitree_rl_gym_tpu", "envs"
)


def resource(path: str) -> str:
    """Resolve a path like ``resources/robots/go2/urdf/go2.urdf`` against the
    repo root (supports the reference's ``{LEGGED_GYM_ROOT_DIR}`` pattern,
    legged_robot.py:294)."""
    path = path.format(UNITREE_RL_GYM_TPU_ROOT_DIR=UNITREE_RL_GYM_TPU_ROOT_DIR)
    if not os.path.isabs(path):
        path = os.path.join(UNITREE_RL_GYM_TPU_ROOT_DIR, path)
    return path
