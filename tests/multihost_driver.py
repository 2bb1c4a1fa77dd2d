"""One process of a multi-process (multi-host) training job — test driver.

Run K copies of this, all pointing at the same coordinator, to fake a
K-host pod on CPUs (SURVEY.md §5.8, §4):

    JAX_COORDINATOR_ADDRESS=localhost:<port> JAX_NUM_PROCESSES=K \
    JAX_PROCESS_ID=<k> python tests/multihost_driver.py

Each process gets 4 virtual CPU devices; the global ("env",) mesh spans
all K*4 devices, so the env axis is sharded *across processes* and the
learner's gradient reductions become cross-process collectives — the same
program shape as a real multi-host TPU pod, minus the ICI.

Everything device-resident is created inside one jitted function (reset +
one PPO train iteration) with the env axis pinned by sharding constraints,
so no host ever materializes another host's shard. Prints one line
``MULTIHOST_OK ...`` on success; the pytest wrapper asserts on it.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from unitree_rl_gym_tpu.parallel import mesh as pmesh  # noqa: E402


def main():
    pmesh.distributed_initialize_if_needed()
    nproc = jax.process_count()
    assert nproc == int(os.environ["JAX_NUM_PROCESSES"]), (
        jax.process_count(), os.environ["JAX_NUM_PROCESSES"],
    )

    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg, go2_rough_train_cfg
    from unitree_rl_gym_tpu.models import networks as nets
    from unitree_rl_gym_tpu.rl.ppo import PPO

    num_envs = 2 * jax.device_count()
    cfg = go2_rough_cfg()
    cfg.env.num_envs = num_envs
    env = LeggedEnv(cfg)
    tcfg = go2_rough_train_cfg()
    tcfg.runner.num_steps_per_env = 4
    tcfg.algorithm.num_mini_batches = 2
    tcfg.algorithm.num_learning_epochs = 2

    net = nets.build_network(tcfg.policy, env.num_actions)
    alg = PPO(net=net, cfg=tcfg.algorithm,
              num_steps=tcfg.runner.num_steps_per_env, num_envs=num_envs,
              share_critic_obs=env.num_privileged_obs is None)
    # params: computed identically on every process (same seed), passed to
    # the jitted step as host-local numpy => treated as replicated input
    ts = jax.device_get(alg.init(jax.random.PRNGKey(0), env.num_obs,
                                 env.num_obs))

    mesh = pmesh.make_mesh()
    assert mesh.size == 4 * nproc
    pmesh.set_env_mesh(mesh)
    es = NamedSharding(mesh, P("env"))

    def constrain(tree):
        def c(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
                return jax.lax.with_sharding_constraint(x, es)
            return x
        return jax.tree.map(c, tree)

    @jax.jit
    def reset_and_train(ts, key):
        env_state, obs = env.reset_all(key)
        env_state = constrain(env_state)
        obs = jax.lax.with_sharding_constraint(obs, es)
        carry = net.initial_carry(num_envs)
        out = alg.train_iteration(env, ts, env_state, obs, obs, carry)
        return out[-1]  # metrics (replicated scalars)

    metrics = jax.device_get(reset_and_train(ts, jax.random.PRNGKey(1)))
    vloss = float(metrics["value_loss"])
    kl = float(metrics["kl"])
    assert jnp.isfinite(vloss) and jnp.isfinite(kl), metrics
    print(
        f"MULTIHOST_OK process={jax.process_index()}/{nproc} "
        f"devices={jax.device_count()} num_envs={num_envs} "
        f"value_loss={vloss:.4f} kl={kl:.5f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
