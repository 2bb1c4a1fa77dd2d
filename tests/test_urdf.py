"""URDF parser: structure checks against known facts of the robot assets."""

import numpy as np
import pytest

from unitree_rl_gym_tpu.models.robot import build_robot
from unitree_rl_gym_tpu.models.urdf import parse_urdf

from unitree_rl_gym_tpu import resource
GO2 = resource("resources/robots/go2/urdf/go2.urdf")
G1 = resource("resources/robots/g1_description/g1_12dof.urdf")
H1 = resource("resources/robots/h1/urdf/h1.urdf")
H1_2 = resource("resources/robots/h1_2/h1_2_12dof.urdf")


def test_go2_structure():
    p = parse_urdf(GO2)
    # 12 actuated joints, 13 dynamic bodies (base + 4 legs x 3 links)
    assert len(p.joint_names) == 12
    assert p.nb == 13
    # feet kept as report bodies (dont_collapse), 4 of them
    feet = [n for n in p.rb_names if "foot" in n]
    assert len(feet) == 4
    # base link is report body 0
    assert p.rb_names[0] == "base"
    # total mass plausible for a Go2 (~15 kg)
    assert 12.0 < p.mass.sum() < 20.0
    # effort limits from URDF present
    assert np.all(p.dof_effort > 0)


def test_go2_dof_order_is_document_order():
    p = parse_urdf(GO2)
    assert p.joint_names[0].endswith("hip_joint")
    legs = {n.split("_")[0] for n in p.joint_names}
    assert legs == {"FL", "FR", "RL", "RR"}
    # each leg contributes hip, thigh, calf in order
    for leg in ["FL", "FR", "RL", "RR"]:
        idx = [i for i, n in enumerate(p.joint_names) if n.startswith(leg)]
        names = [p.joint_names[i].split("_")[1] for i in idx]
        assert names == ["hip", "thigh", "calf"]


@pytest.mark.parametrize(
    "path,nj", [(GO2, 12), (G1, 12), (H1, 10), (H1_2, 12)]
)
def test_all_robots_parse(path, nj):
    p = parse_urdf(path)
    assert len(p.joint_names) == nj
    assert p.nb == nj + 1
    assert p.cp_pos.shape[0] > 0
    # contact points reference valid bodies
    assert p.cp_dyn.max() < p.nb
    assert p.cp_body.max() < len(p.rb_names)


def test_fixed_merge_preserves_mass():
    p = parse_urdf(GO2)
    # merged dynamic mass must equal the sum of every link's mass
    import xml.etree.ElementTree as ET

    total = sum(
        float(m.attrib["value"])
        for m in ET.parse(GO2).getroot().iter("mass")
    )
    assert abs(p.mass.sum() - total) < 1e-9


def test_g1_feet_report_bodies():
    p = parse_urdf(G1)
    feet = p.match_bodies(["ankle_roll"])
    assert len(feet) == 2
    # ankle_roll links carry several contact spheres each
    n_foot_points = sum(int((p.cp_body == i).sum()) for i in feet)
    assert n_foot_points >= 8


def test_build_robot_gains_and_defaults():
    r = build_robot(GO2)
    kp, kd = r.pd_gains({"joint": 20.0}, {"joint": 0.5})
    assert np.all(kp == 20.0) and np.all(kd == 0.5)
    default = r.default_dof_pos(
        {
            "FL_hip_joint": 0.1, "RL_hip_joint": 0.1,
            "FR_hip_joint": -0.1, "RR_hip_joint": -0.1,
            "FL_thigh_joint": 0.8, "RL_thigh_joint": 1.0,
            "FR_thigh_joint": 0.8, "RR_thigh_joint": 1.0,
            "FL_calf_joint": -1.5, "RL_calf_joint": -1.5,
            "FR_calf_joint": -1.5, "RR_calf_joint": -1.5,
        }
    )
    assert default[r.parsed.dof_index("FL_thigh_joint")] == 0.8
    assert default[r.parsed.dof_index("RR_hip_joint")] == -0.1
