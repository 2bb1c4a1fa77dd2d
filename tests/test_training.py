"""End-to-end training smoke tests + export cross-validation.

Covers the rsl_rl-contract surface (SURVEY.md §1.3): runner construction
via the registry, learn() for a few iterations on Go2 (MLP) and G1 (LSTM),
checkpoint save/load round-trip, and TorchScript export that numerically
matches the JAX actor."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitree_rl_gym_tpu.envs.registry import task_registry
from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner


def tiny_args(task, num_envs=8, iters=2):
    from unitree_rl_gym_tpu.utils.helpers import get_args

    return get_args([
        f"--task={task}", f"--num_envs={num_envs}",
        f"--max_iterations={iters}", "--headless",
    ])


@pytest.fixture(scope="module")
def go2_setup(tmp_path_factory):
    args = tiny_args("go2")
    env, env_cfg = task_registry.make_env(name="go2", args=args)
    log_dir = str(tmp_path_factory.mktemp("go2_logs"))
    _, train_cfg = task_registry.get_cfgs("go2")
    train_cfg.runner.num_steps_per_env = 8
    runner = OnPolicyRunner(env, train_cfg, log_dir)
    return env, runner, log_dir


def test_go2_learn_two_iterations(go2_setup):
    env, runner, log_dir = go2_setup
    runner.learn(2, init_at_random_ep_len=True)
    assert runner.current_learning_iteration == 2
    # final checkpoint written
    files = os.listdir(log_dir)
    assert any(f.startswith("model_") and f.endswith(".ckpt") for f in files)


def test_checkpoint_roundtrip(go2_setup):
    env, runner, log_dir = go2_setup
    path = os.path.join(log_dir, "model_roundtrip.ckpt")
    runner.save(path)
    before = jax.tree.map(np.asarray, runner.train_state.params)
    runner2 = OnPolicyRunner(env, runner.cfg, None)
    runner2.load(path)
    after = jax.tree.map(np.asarray, runner2.train_state.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)


def test_inference_policy_and_export(go2_setup, tmp_path):
    env, runner, _ = go2_setup
    policy = runner.get_inference_policy()
    obs = jnp.ones((4, env.num_obs)) * 0.1
    act = policy(obs)
    assert act.shape == (4, env.num_actions)

    from unitree_rl_gym_tpu.export.export import export_policy
    meta = export_policy(runner, str(tmp_path))
    assert os.path.exists(tmp_path / "policy_flat.npz")
    assert os.path.exists(tmp_path / "policy_1.pt")
    # TorchScript output must match the JAX actor numerically
    import torch

    mod = torch.jit.load(str(tmp_path / "policy_1.pt"))
    torch_out = mod(torch.from_numpy(np.asarray(obs))).detach().numpy()
    np.testing.assert_allclose(torch_out, np.asarray(act), atol=1e-5)


@pytest.mark.parametrize("task", ["g1"])
def test_lstm_task_learns_and_exports(task, tmp_path):
    args = tiny_args(task, num_envs=8, iters=1)
    env, env_cfg = task_registry.make_env(name=task, args=args)
    _, train_cfg = task_registry.get_cfgs(task)
    train_cfg.runner.num_steps_per_env = 8
    runner = OnPolicyRunner(env, train_cfg, None)
    assert runner.net.is_recurrent
    runner.learn(1)
    # stateful inference policy
    policy = runner.get_inference_policy()
    obs = jnp.ones((1, env.num_obs)) * 0.05
    a1 = np.asarray(policy(obs))
    a2 = np.asarray(policy(obs))          # carry advanced -> different output
    assert a1.shape == (1, env.num_actions)
    assert not np.allclose(a1, a2)
    policy.reset_memory()
    a3 = np.asarray(policy(obs))
    np.testing.assert_allclose(a1, a3, atol=1e-6)

    # LSTM TorchScript export matches the JAX actor step-by-step
    from unitree_rl_gym_tpu.export.export import export_policy
    export_policy(runner, str(tmp_path))
    import torch

    mod = torch.jit.load(str(tmp_path / "policy_lstm_1.pt"))
    policy.reset_memory()
    tobs = torch.from_numpy(np.asarray(obs))
    for i in range(3):
        t_out = mod(tobs).detach().numpy()
        j_out = np.asarray(policy(obs))
        np.testing.assert_allclose(t_out, j_out, atol=1e-4)


def test_registry_has_all_five_tasks():
    for name in ["go2", "h1", "h1_2", "g1", "go2_handstand"]:
        assert name in task_registry.task_classes


def test_anchor_kl_and_class_weights_pin_the_skill(tmp_path):
    """The skill-preserving fine-tune knobs (AlgorithmCfg.anchor_kl_coef +
    class_target_frac, r5): with a frozen anchor and a strong coefficient,
    the policy's drift from the anchor ON TASK-CRITICAL STATES (inverted
    band, env.ppo_state_class_fn) must be smaller than an unanchored run
    from the same seed — while training still proceeds (params change).
    Also pins the load_flat_params inverse of the flat export."""
    from unitree_rl_gym_tpu.export.export import (
        _flatten_params, load_flat_params,
    )
    from unitree_rl_gym_tpu.models import networks as nets

    def make_runner(anchor_coef):
        cfg, tcfg = task_registry.get_cfgs("go2_handstand")
        cfg.env.num_envs = 8
        cfg.init_state.handstand_init_prob = 1.0
        cfg.init_state.handstand_init_prob_final = 1.0
        cfg.init_state.handstand_mid_frac = 0.0
        tcfg.runner.num_steps_per_env = 4
        tcfg.runner.save_interval = 1000
        tcfg.algorithm.anchor_kl_coef = anchor_coef
        tcfg.algorithm.class_target_frac = 0.5 if anchor_coef else 0.0
        env = task_registry.get_task_class("go2_handstand")(cfg)
        runner = OnPolicyRunner(env, tcfg, None)
        return env, runner

    env, anchored = make_runner(50.0)
    assert anchored.alg.state_class_fn is not None
    anchor_params = jax.tree.map(np.asarray, anchored.train_state.params)
    anchored.set_anchor()
    anchored.learn(2, init_at_random_ep_len=True)

    _, free = make_runner(0.0)
    free.learn(2, init_at_random_ep_len=True)

    # same seed => identical anchor reference for both runs
    jax.tree.map(
        np.testing.assert_array_equal, anchor_params,
        jax.tree.map(np.asarray, free.alg.init(
            jax.random.PRNGKey(free.cfg.seed), env.num_obs, env.num_obs
        ).params),
    )

    # drift measured as KL(anchor || pi) on inverted-band states
    state, obs = env.reset_all(jax.random.PRNGKey(5))
    mask = np.asarray(env.ppo_state_class_fn(obs))
    assert mask.mean() > 0.9  # RSI p=1: starts are inverted
    carry = anchored.net.initial_carry(obs.shape[0])

    def drift(runner):
        a_mu, a_std, _, _ = runner.net.apply(
            jax.tree.map(jnp.asarray, anchor_params), obs, obs, carry
        )
        mu, std, _, _ = runner.net.apply(
            runner.train_state.params, obs, obs, carry
        )
        return float(jnp.mean(nets.kl_divergence(a_mu, a_std, mu, std)))

    d_anchored, d_free = drift(anchored), drift(free)
    assert d_anchored < d_free * 0.8, (d_anchored, d_free)
    # training still moved the anchored params
    assert d_anchored > 0.0

    # flat-export inverse: flatten -> npz -> load == original tree
    import numpy as _np

    flat = _flatten_params(anchored.train_state.params)
    f = os.path.join(str(tmp_path), "policy_flat.npz")
    _np.savez(f, **flat)
    back = load_flat_params(f)
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.tree.map(np.asarray, anchored.train_state.params), back,
    )


def test_nan_guard_skips_nonfinite_minibatch():
    """AlgorithmCfg.nan_guard: a minibatch with non-finite gradients must
    leave params, adam moments and the adaptive LR untouched (one critic
    explosion otherwise NaNs every parameter through the global-norm
    clip — the E7 failure, doc/handstand_r5_notes.md)."""
    import optax

    from unitree_rl_gym_tpu.rl.ppo import PPO
    from unitree_rl_gym_tpu.utils.config import AlgorithmCfg

    alg = PPO(net=None, cfg=AlgorithmCfg(), num_steps=1, num_envs=1)
    opt = alg.make_optimizer()
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    opt_state = opt.init(params)
    lr = jnp.asarray(1e-3)

    # finite step: applied
    good = {"w": jnp.full((4,), 0.1), "b": jnp.full((2,), 0.2)}
    p2, os2, lr2, skipped = alg._apply_step(
        opt, params, opt_state, lr, good, jnp.asarray(1.0),
        jnp.asarray(0.01),
    )
    assert float(skipped) == 0.0
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(params["w"]))

    # non-finite step: fully skipped
    bad = {"w": jnp.full((4,), np.nan), "b": jnp.full((2,), 0.2)}
    p3, os3, lr3, skipped = alg._apply_step(
        opt, p2, os2, lr2, bad, jnp.asarray(np.nan), jnp.asarray(np.nan),
    )
    assert float(skipped) == 1.0
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.tree.map(np.asarray, p3), jax.tree.map(np.asarray, p2),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        os3, os2,
    )
    assert float(lr3) == float(lr2)
    assert np.all(np.isfinite(np.asarray(p3["w"])))
