"""Regenerate collision_points.json caches for robots with mesh collisions.

Meshes are not vendored in this repo (they are only needed for this one-time
approximation); point --mesh_root at a robot_description checkout that has
them (e.g. the upstream unitree_rl_gym resources tree).
"""

import argparse
import os

from unitree_rl_gym_tpu import resource
from unitree_rl_gym_tpu.models.mesh_approx import generate_cache

ROBOTS = [
    "resources/robots/h1/urdf/h1.urdf",
    "resources/robots/g1_description/g1_12dof.urdf",
    "resources/robots/h1_2/h1_2_12dof.urdf",
    "resources/robots/go2/urdf/go2.urdf",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_root", default=None,
                    help="directory tree holding the robots' mesh files")
    args = ap.parse_args()
    for rel in ROBOTS:
        urdf = resource(rel)
        mesh_root = None
        if args.mesh_root:
            # mirror the robot's directory layout under mesh_root
            mesh_root = os.path.join(
                args.mesh_root, os.path.dirname(os.path.dirname(rel))
            ) if "urdf/" in rel else os.path.join(
                args.mesh_root, os.path.dirname(rel)
            )
            mesh_root = os.path.join(mesh_root, os.path.basename(os.path.dirname(urdf)))
        print(generate_cache(urdf, mesh_root=_mesh_dir(args.mesh_root, rel)))


def _mesh_dir(mesh_root, rel):
    if mesh_root is None:
        return None
    return os.path.join(mesh_root, os.path.dirname(rel))


if __name__ == "__main__":
    main()
