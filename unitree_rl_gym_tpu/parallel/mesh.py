"""Device-mesh sharding for env-batch data parallelism.

The reference's only parallelism is the 4096-env batch on one GPU
(SURVEY.md §2.3); its ``--horovod`` flag is dead. Here the env axis is a
first-class sharded dimension: a 1-D ``("env",)`` mesh over all chips
(single host: the 4 chips of a v5e-4; multi-host: the full pod slice via
``jax.distributed``). Env state lives sharded on that axis, params are
replicated, and the learner's minibatch statistics/gradients become
XLA-inserted collectives (psum over ICI) — nothing in the algorithm code
changes, which is the point of SPMD.

The networks are tiny MLP/LSTMs (legged_robot_config.py:249-251), so
TP/PP/SP would only add collective latency; env-batch DP is the axis that
matters at this scale (SURVEY.md §2.3), and the design leaves the batch
dimension free to reshard if bigger models ever appear.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("env",))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (env) axis sharded across the mesh."""
    return NamedSharding(mesh, P("env"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(tree, mesh: Mesh):
    """Place a batched pytree (leading axis = env) onto the mesh, sharded
    along the env axis; scalars/keys are replicated. Row-layout leaves
    (EnvState.gh [ncp, N] — the r5 terrain-carry contract,
    physics/pallas_step.py) are sharded on axis 1 instead."""
    es = env_sharding(mesh)
    rep = replicated(mesh)
    rows = NamedSharding(mesh, P(None, "env"))
    # the env batch size, for recognizing row-layout leaves
    N = getattr(getattr(tree, "episode_length", None), "shape", (0,))[0]

    def place(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return jax.device_put(x, rep)
        if (
            N and x.ndim >= 2 and x.shape[0] != N and x.shape[1] == N
            and x.shape[1] >= mesh.size
        ):
            return jax.device_put(x, rows)
        if x.shape[0] >= mesh.size:
            return jax.device_put(x, es)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


# ---------------------------------------------------------------------------
# ambient env mesh
#
# The physics backend dispatch (physics/backend.py) cannot see sharding at
# trace time, so components that shard the env axis register the mesh here;
# the dispatcher then routes the batch through the Pallas kernel under
# ``jax.shard_map`` (one kernel instance per chip, env block local).
# ---------------------------------------------------------------------------

_ENV_MESH: Optional[Mesh] = None


def set_env_mesh(mesh: Optional[Mesh]):
    global _ENV_MESH
    _ENV_MESH = mesh


def get_env_mesh() -> Optional[Mesh]:
    return _ENV_MESH


def auto_mesh() -> Optional[Mesh]:
    """The ("env",) mesh over all chips when there is more than one TPU
    device (or UTRL_SHARD_ENVS=1 forces it, e.g. CPU-faked pods in tests);
    None on a single chip."""
    import os

    force = os.environ.get("UTRL_SHARD_ENVS") == "1"
    if jax.device_count() > 1 and (
        force or jax.default_backend() == "tpu"
    ):
        return make_mesh()
    return None


def distributed_initialize_if_needed():
    """Multi-host entry (SURVEY.md §5.8): initialize ``jax.distributed``
    when launched as one process of a multi-process job.

    Launch recipe (every process, same coordinator)::

        JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=K \\
        JAX_PROCESS_ID=<k> python -m unitree_rl_gym_tpu.scripts.train ...

    On cloud TPU pods the three variables are optional — with only
    ``JAX_COORDINATOR_ADDRESS`` unset-but-cluster-detected environments
    fall through to jax's auto-detection. Tested without TPUs by
    ``tests/test_multihost.py`` (two CPU processes, 4 virtual devices
    each, one PPO iteration with the env axis sharded across processes).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc is None:
        jax.distributed.initialize()  # cluster auto-detection
    else:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
