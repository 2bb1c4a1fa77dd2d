"""Multi-chip Pallas physics: the fused kernel under ``jax.shard_map`` over
the ("env",) mesh (physics/pallas_step.py:control_step_pallas_sharded) must
match the SoA-XLA backend bit-for-bit-ish, and the runner must train with
the env axis sharded (UTRL_SHARD_ENVS=1 forces the mesh on the CPU-faked
pod, parallel/mesh.py:auto_mesh)."""

import os

import jax
import jax.numpy as jnp
import pytest


def _build_env(num_envs):
    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg

    cfg = go2_rough_cfg()
    cfg.env.num_envs = num_envs
    return LeggedEnv(cfg), cfg


def test_pallas_sharded_matches_soa():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    from unitree_rl_gym_tpu.parallel import mesh as pmesh
    from unitree_rl_gym_tpu.physics import backend as pb
    from unitree_rl_gym_tpu.physics import pallas_step

    n = 2 * 256  # 2 shards x minimum pallas block
    env, cfg = _build_env(n)
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    target = env.default_dof_pos[None, :] * jnp.ones((n, 1))
    mesh = pmesh.make_mesh(2)

    args = (env.robot.dyn, env.cparams, env.pd, cfg.sim.dt, 2,
            state.phys, target, state.friction, state.mass_scale,
            env.m_eff_n, env.m_eff_t)
    s_soa, aux_soa = pb.control_step(*args, backend="soa")
    s_pal, aux_pal = pallas_step.control_step_pallas_sharded(
        *args, mesh=mesh, interpret=True
    )

    for name, a, b in [
        ("joint_q", s_soa.joint_q, s_pal.joint_q),
        ("v", s_soa.v, s_pal.v),
        ("base_pos", s_soa.base_pos, s_pal.base_pos),
        ("base_quat", s_soa.base_quat, s_pal.base_quat),
        ("torques", aux_soa["torques"], aux_pal["torques"]),
        ("cf_rb", aux_soa["cf_rb"], aux_pal["cf_rb"]),
    ]:
        assert float(jnp.max(jnp.abs(a - b))) < 2e-4, name
    # sharding actually happened: output leaves live on the mesh
    assert len(s_pal.joint_q.sharding.device_set) == 2


def test_runner_trains_with_sharded_env_axis(tmp_path, monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    monkeypatch.setenv("UTRL_SHARD_ENVS", "1")
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_train_cfg
    from unitree_rl_gym_tpu.parallel import mesh as pmesh
    from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner

    env, _ = _build_env(16)
    tcfg = go2_rough_train_cfg()
    tcfg.runner.num_steps_per_env = 4
    tcfg.algorithm.num_mini_batches = 2
    tcfg.algorithm.num_learning_epochs = 1
    runner = OnPolicyRunner(env, tcfg, log_dir=None)
    try:
        assert runner.mesh is not None and runner.mesh.size == 8
        runner.learn(num_learning_iterations=2)
        ts = runner.train_state
        assert bool(jnp.all(jnp.isfinite(ts.lr)))
    finally:
        pmesh.set_env_mesh(None)


def test_pallas_sharded_terrain_gh_and_pxy():
    """Terrain operands under shard_map: the gh heights input rides
    PartitionSpec("env") into the kernel and the end-of-step point-xy
    carry output (aux["p_xy"], the r3 lag-free terrain formulation) comes
    back sharded and matching the SoA reference."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    import numpy as np

    from unitree_rl_gym_tpu.envs.base_env import LeggedEnv
    from unitree_rl_gym_tpu.envs.go2 import go2_rough_cfg
    from unitree_rl_gym_tpu.parallel import mesh as pmesh
    from unitree_rl_gym_tpu.physics import backend as pb
    from unitree_rl_gym_tpu.physics import pallas_step

    n = 2 * 8
    cfg = go2_rough_cfg()
    cfg.env.num_envs = n
    cfg.terrain.mesh_type = "heightfield"
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 4.0
    cfg.terrain.border_size = 2.0
    env = LeggedEnv(cfg)
    state, _ = env.reset_all(jax.random.PRNGKey(0))
    target = env.default_dof_pos[None, :] * jnp.ones((n, 1))
    mesh = pmesh.make_mesh(2)

    gh = pb.sample_point_heights(env.robot.dyn, state.phys, env.ground_fn)
    args = (env.robot.dyn, env.cparams, env.pd, cfg.sim.dt, 2,
            state.phys, target, state.friction, state.mass_scale,
            env.m_eff_n, env.m_eff_t)
    s_soa, aux_soa = pb.control_step(*args, ground_fn=env.ground_fn,
                                     backend="soa")
    s_pal, aux_pal = pallas_step.control_step_pallas_sharded(
        *args, mesh=mesh, interpret=True, gh=gh
    )
    ncp = gh.shape[0]
    assert "p_xy" in aux_pal and aux_pal["p_xy"].shape == (2 * ncp, gh.shape[1])
    np.testing.assert_allclose(
        np.asarray(s_soa.base_pos), np.asarray(s_pal.base_pos), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(aux_soa["p_xy"]), np.asarray(aux_pal["p_xy"]), atol=5e-3
    )
    assert len(s_pal.joint_q.sharding.device_set) == 2
