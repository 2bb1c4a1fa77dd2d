"""Visualization replay tests (headless): every task's view model loads,
maps env joints to MuJoCo qpos addresses, and accepts frames.

Covers the viewer-parity gap vs reference base_task.py:63-115 without
needing a display: RolloutViewer with ``viewer=False`` only mirrors state
into MjData via mj_forward.
"""

import os

import numpy as np
import pytest

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.models.robot import build_robot
from unitree_rl_gym_tpu.utils import viz

TASK_URDF = {
    "go2": "resources/robots/go2/urdf/go2.urdf",
    "g1": "resources/robots/g1_description/g1_12dof.urdf",
    "h1": "resources/robots/h1/urdf/h1.urdf",
    "h1_2": "resources/robots/h1_2/h1_2_12dof.urdf",
}


class _EnvStub:
    """The slice of the env surface load_view_model consumes."""

    def __init__(self, task):
        self.robot = build_robot(
            os.path.join(UNITREE_RL_GYM_TPU_ROOT_DIR, TASK_URDF[task])
        )
        self.num_actions = self.robot.num_dof
        self.dt = 0.02

        class asset:
            file = TASK_URDF[task]

        class cfg:
            pass

        cfg.asset = asset
        self.cfg = cfg


@pytest.mark.parametrize("task", ["go2", "g1", "h1", "h1_2"])
def test_view_model_loads_and_maps(task):
    env = _EnvStub(task)
    m, qpos_addr = viz.load_view_model(task, env)
    # freejoint base: qpos = 7 + one hinge coordinate per env DoF (the
    # humanoid scenes may carry extra robot DoF beyond the trained set)
    assert m.nq >= 7 + env.num_actions
    assert len(qpos_addr) == env.num_actions
    assert len(set(qpos_addr.tolist())) == env.num_actions
    assert (qpos_addr >= 7).all()


def test_rollout_viewer_headless_frames():
    env = _EnvStub("go2")
    rv = viz.RolloutViewer("go2", env, viewer=False, realtime=False)
    q = np.linspace(-0.3, 0.3, env.num_actions)
    rv.set_frame([0.1, 0.2, 0.42], [0.0, 0.0, 0.0, 1.0], q)
    np.testing.assert_allclose(rv.data.qpos[0:3], [0.1, 0.2, 0.42])
    # xyzw -> wxyz
    np.testing.assert_allclose(rv.data.qpos[3:7], [1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(rv.data.qpos[rv.qpos_addr], q)
    rv.close()


def test_handstand_uses_base_scene():
    env = _EnvStub("go2")
    m, _ = viz.load_view_model("go2_handstand", env)
    assert m.nq == 7 + env.num_actions
