"""Native deploy stack: builds the C++ controller with CMake and runs its
test binary, including numeric parity of the C++ policy evaluator against
the JAX actor (fixtures generated here)."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR

CPP_DIR = os.path.join(
    UNITREE_RL_GYM_TPU_ROOT_DIR, "unitree_rl_gym_tpu", "deploy", "cpp"
)

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)


@pytest.fixture(scope="module")
def build_dir(tmp_path_factory):
    bd = tmp_path_factory.mktemp("cpp_build")
    subprocess.run(
        ["cmake", "-S", CPP_DIR, "-B", str(bd), "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", str(bd), "-j2"], check=True, capture_output=True
    )
    return bd


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Train a tiny G1 LSTM policy, export policy.bin, record obs->action
    fixtures from the JAX actor, and write a cpp-consumable config."""
    import jax
    import jax.numpy as jnp

    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.export.export import export_cpp_bin
    from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner
    from unitree_rl_gym_tpu.utils.helpers import get_args

    out = tmp_path_factory.mktemp("cpp_artifacts")
    args = get_args(["--task=g1", "--num_envs=4", "--max_iterations=1"])
    env, _ = task_registry.make_env(name="g1", args=args)
    _, train_cfg = task_registry.get_cfgs("g1")
    runner = OnPolicyRunner(env, train_cfg, None)
    bin_path = export_cpp_bin(runner, str(out))

    policy = runner.get_inference_policy()
    rng = np.random.RandomState(0)
    cases = []
    policy.reset_memory()
    for _ in range(8):
        obs = rng.uniform(-1, 1, env.num_obs).astype(np.float32)
        act = np.asarray(policy(jnp.asarray(obs[None])))[0]
        cases.append((obs, act.astype(np.float32)))
    fx_path = os.path.join(out, "fixtures.bin")
    with open(fx_path, "wb") as f:
        f.write(struct.pack("<3I", len(cases), env.num_obs, env.num_actions))
        for obs, act in cases:
            f.write(obs.tobytes())
            f.write(act.tobytes())

    # config for the controller test: the g1 deploy yaml with policy.bin
    src = os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR,
        "unitree_rl_gym_tpu/deploy/deploy_real/configs/g1.yaml",
    )
    cfg_path = os.path.join(out, "g1_test.yaml")
    with open(src) as f:
        text = f.read()
    text = text.replace(
        '"{UNITREE_RL_GYM_TPU_ROOT_DIR}/logs/g1/exported/policies/policy_lstm_1.pt"',
        f'"{bin_path}"',
    )
    with open(cfg_path, "w") as f:
        f.write(text)
    return bin_path, fx_path, cfg_path


def test_cpp_unit_tests(build_dir):
    r = subprocess.run(
        [str(build_dir / "deploy_tests")], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL CPP TESTS PASSED" in r.stdout


def test_cpp_policy_parity_and_controller(build_dir, artifacts):
    bin_path, fx_path, cfg_path = artifacts
    r = subprocess.run(
        [str(build_dir / "deploy_tests"), bin_path, fx_path, cfg_path],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "policy parity" in r.stdout
    assert "controller loop ok" in r.stdout
