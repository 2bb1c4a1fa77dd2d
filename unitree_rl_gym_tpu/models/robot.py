"""Bridge from the host-side URDF parse to the device-side dynamics model.

Produces the :class:`~unitree_rl_gym_tpu.physics.dynamics.DynModel` (jnp
constants closed over by the jitted step) plus convenience lookups that the
env layer needs: dof ordering, default joint angles by name-matching
(legged_robot.py:169-186), PD gain assignment by substring match
(legged_robot.py:176-183), and body-group index resolution
(legged_robot.py:346-352, 384-407).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from unitree_rl_gym_tpu.models.urdf import ParsedRobot, parse_urdf
from unitree_rl_gym_tpu.physics import spatial as sp
from unitree_rl_gym_tpu.physics.dynamics import DynModel


@dataclasses.dataclass(frozen=True)
class Robot:
    """Full robot description: dynamics model + env-facing metadata."""

    parsed: ParsedRobot
    dyn: DynModel
    # numpy views used at trace time by the env layer
    dof_lower: np.ndarray
    dof_upper: np.ndarray
    dof_effort: np.ndarray
    dof_velocity: np.ndarray

    @property
    def num_dof(self) -> int:
        return len(self.parsed.joint_names)

    @property
    def num_bodies(self) -> int:
        return len(self.parsed.rb_names)

    @property
    def dof_names(self) -> List[str]:
        return self.parsed.joint_names

    @property
    def body_names(self) -> List[str]:
        return self.parsed.rb_names

    def default_dof_pos(self, default_joint_angles: Dict[str, float]) -> np.ndarray:
        """Exact-name lookup of default angles (legged_robot.py:171-174)."""
        out = np.zeros(self.num_dof)
        for i, name in enumerate(self.dof_names):
            out[i] = default_joint_angles[name]
        return out

    def pd_gains(self, stiffness: Dict[str, float], damping: Dict[str, float]):
        """Substring-matched PD gain assignment (legged_robot.py:176-185);
        unmatched joints get zero gains."""
        kp = np.zeros(self.num_dof)
        kd = np.zeros(self.num_dof)
        for i, name in enumerate(self.dof_names):
            for key, val in stiffness.items():
                if key in name:
                    kp[i] = val
                    kd[i] = damping[key]
        return kp, kd

    def body_indices(self, substrings: List[str]) -> np.ndarray:
        return np.asarray(self.parsed.match_bodies(substrings), dtype=np.int32)


def build_robot(
    urdf_path: str,
    armature: float = 0.0,
    gravity=(0.0, 0.0, -9.81),
    dtype=jnp.float32,
    contact_bodies=None,
) -> Robot:
    """Parse ``urdf_path`` and freeze it into device constants.

    ``armature`` mirrors Isaac Gym's asset option (h1_2_config.py:88).
    ``contact_bodies`` optionally restricts contact-point emission (see
    :func:`~unitree_rl_gym_tpu.models.urdf.parse_urdf`).
    """
    p = parse_urdf(urdf_path, contact_bodies=contact_bodies)
    I_sp = np.zeros((p.nb, 6, 6))
    for i in range(p.nb):
        I_sp[i] = np.asarray(
            sp.spatial_inertia(
                jnp.asarray(p.mass[i]),
                jnp.asarray(p.com[i]),
                jnp.asarray(p.inertia[i]),
            )
        )
    dyn = DynModel(
        parent=tuple(int(x) for x in p.parent),
        joint_axis=jnp.asarray(p.joint_axis, dtype),
        Etree=jnp.asarray(p.Etree, dtype),
        rtree=jnp.asarray(p.rtree, dtype),
        I_sp=jnp.asarray(I_sp, dtype),
        base_mass=float(p.mass[0]),
        armature=float(armature),
        dof_damping=jnp.asarray(p.dof_damping, dtype),
        dof_friction=jnp.asarray(p.dof_friction, dtype),
        dof_vel_limit=jnp.asarray(
            np.where(p.dof_velocity > 0, p.dof_velocity, np.inf), dtype
        ),
        dof_lower=jnp.asarray(
            np.where(p.dof_upper > p.dof_lower, p.dof_lower, -np.inf), dtype
        ),
        dof_upper=jnp.asarray(
            np.where(p.dof_upper > p.dof_lower, p.dof_upper, np.inf), dtype
        ),
        rb_dyn_idx=jnp.asarray(p.rb_dyn_idx),
        rb_rot=jnp.asarray(p.rb_rot, dtype),
        rb_pos=jnp.asarray(p.rb_pos, dtype),
        cp_dyn=jnp.asarray(p.cp_dyn),
        cp_body=jnp.asarray(p.cp_body),
        cp_pos=jnp.asarray(p.cp_pos, dtype),
        cp_radius=jnp.asarray(p.cp_radius, dtype),
        gravity=jnp.asarray(gravity, dtype),
    )
    return Robot(
        parsed=p,
        dyn=dyn,
        dof_lower=p.dof_lower,
        dof_upper=p.dof_upper,
        dof_effort=p.dof_effort,
        dof_velocity=p.dof_velocity,
    )
