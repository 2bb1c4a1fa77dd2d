import jax, jax.numpy as jnp, numpy as np
from unitree_rl_gym_tpu.envs.registry import task_registry
from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner
from unitree_rl_gym_tpu.utils.helpers import get_args

args = get_args(["--task=g1", "--headless"])
env, _ = task_registry.make_env(name="g1", args=args)
_, tcfg = task_registry.get_cfgs("g1")
runner = OnPolicyRunner(env, tcfg, None)
runner._ensure_env(init_at_random_ep_len=True)
for it in range(8):
    out = runner._iter_fn(runner.train_state, runner._env_state,
                          runner._obs, runner._critic_obs, runner._carry)
    runner.train_state, runner._env_state, runner._obs, runner._critic_obs, runner._carry, metrics = out
    p_nan = sum(int(jnp.isnan(x).sum()) for x in jax.tree.leaves(runner.train_state.params))
    o_nan = int(jnp.isnan(runner._obs).sum())
    q_nan = int(jnp.isnan(runner._env_state.phys.joint_q).sum())
    v_max = float(jnp.abs(runner._env_state.phys.v).max())
    std = jnp.exp(runner.train_state.params["params"]["log_std"]) if "log_std" in str(jax.tree_util.tree_structure(runner.train_state.params)) else None
    leaves = {k: v for k, v in jax.tree_util.tree_leaves_with_path(runner.train_state.params)}
    stds = [ (jax.tree_util.keystr(k), float(jnp.exp(v).max())) for k, v in jax.tree_util.tree_leaves_with_path(runner.train_state.params) if "log_std" in jax.tree_util.keystr(k)]
    print(f"it {it} lr {float(metrics['lr']):.1e} kl {float(metrics['kl']):.4f} "
          f"param_nans {p_nan} obs_nans {o_nan} q_nans {q_nan} vmax {v_max:.1f} std {stds}",
          flush=True)
