"""Probe-compile VMEM fallback (physics/backend.py pallas_probe_ok).

``pallas_step._fits_vmem`` is a calibrated estimate of the kernel's
scoped-VMEM footprint; the probe compile is the ground truth. These tests
exercise the degrade-gracefully plumbing: a model whose kernel fails to
compile (as a Mosaic VMEM overflow would on TPU) must fall back to the
SoA XLA backend with a warning instead of raising mid-train-step.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.registry import task_registry
from unitree_rl_gym_tpu.physics import backend as pb
from unitree_rl_gym_tpu.physics import pallas_step

N = 8


@pytest.fixture()
def go2_env():
    cfg, _ = task_registry.get_cfgs("go2")
    cfg.env.num_envs = N
    return task_registry.get_task_class("go2")(cfg)


def test_probe_failure_warns_and_caches(go2_env, monkeypatch):
    env = go2_env

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of scoped vmem")

    monkeypatch.setattr(pallas_step, "control_step_pallas", boom)
    pb._PROBE_CACHE.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ok = pb.pallas_probe_ok(
            env.robot.dyn, env.cparams, env.pd, env.cfg.sim.dt,
            env.cfg.control.decimation, terrain=False, has_cstiff=False,
        )
    assert ok is False
    assert any("falling back" in str(x.message) for x in w)
    # cached verdict: no recompile, no second warning
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        ok2 = pb.pallas_probe_ok(
            env.robot.dyn, env.cparams, env.pd, env.cfg.sim.dt,
            env.cfg.control.decimation, terrain=False, has_cstiff=False,
        )
    assert ok2 is False and not w2
    pb._PROBE_CACHE.clear()


def test_dispatch_degrades_to_soa_on_probe_failure(go2_env, monkeypatch):
    """auto dispatch on a (faked) TPU with a kernel that cannot compile
    must still produce a working control step via the SoA backend."""
    env = go2_env
    state, _ = env.reset_all(jax.random.PRNGKey(0))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    monkeypatch.setattr(pallas_step, "supports", lambda *a, **k: True)

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of scoped vmem")

    monkeypatch.setattr(pallas_step, "control_step_pallas", boom)
    pb._PROBE_CACHE.clear()

    target = jnp.broadcast_to(env.default_dof_pos, (N, env.num_actions))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        phys, aux = pb.control_step(
            env.robot.dyn, env.cparams, env.pd, env.cfg.sim.dt,
            env.cfg.control.decimation, state.phys, target,
            jnp.ones((N,)), jnp.ones((N,)), env.m_eff_n, env.m_eff_t,
            backend="auto",
        )
    assert np.isfinite(np.asarray(phys.base_pos)).all()
    assert aux["torques"].shape == (N, env.robot.num_dof)
    pb._PROBE_CACHE.clear()


def test_probe_passes_for_shipped_models(go2_env, monkeypatch):
    """On CPU the probe compiles the kernel through the Pallas interpreter
    (at a small block so the test is fast); it must succeed for the
    shipped Go2 model. The real Mosaic scoped-VMEM check only exists on
    TPU, where the driver's bench exercises it for every shipped config."""
    env = go2_env
    pb._PROBE_CACHE.clear()
    monkeypatch.setattr(pallas_step, "BLOCK_ENVS", 8)
    monkeypatch.setenv("UTRL_PALLAS_INTERPRET", "1")
    ok = pb.pallas_probe_ok(
        env.robot.dyn, env.cparams, env.pd, env.cfg.sim.dt,
        env.cfg.control.decimation, terrain=False, has_cstiff=False,
    )
    assert ok is True
    pb._PROBE_CACHE.clear()
