"""Regenerate the golden fixed-seed env traces under resources/golden/.

Usage:  python -m tests.regen_golden [task ...]     (default: all 5 tasks)

Each trace pins 16 control steps of obs/reward/done for 8 envs on the CPU
SoA backend under a fixed seed and deterministic pseudo-random actions.
tests/test_golden_traces.py compares current env numerics against these
EXACTLY (atol=0) — any refactor that changes env numerics (even benignly)
must consciously re-run this script and commit the new traces with an
explanation in the commit message (BASELINE.json fixed-seed
reproducibility; VERDICT r2 item 7).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

N_ENVS = 8
N_STEPS = 16
SEED = 1234


def trace_task(task: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unitree_rl_gym_tpu.envs.registry import task_registry

    cfg, _ = task_registry.get_cfgs(task)
    cfg.env.num_envs = N_ENVS
    # golden traces pin the stochastic pipeline too (noise/DR/push all on,
    # per-task defaults untouched) — determinism comes from the fixed seed
    cfg.seed = SEED
    env = task_registry.get_task_class(task)(cfg)
    state, obs = env.reset_all(jax.random.PRNGKey(SEED))
    step = jax.jit(env.step)

    na = env.num_actions
    akey = jax.random.PRNGKey(SEED + 1)
    obs_t, rew_t, done_t, act_t = [], [], [], []
    for t in range(N_STEPS):
        akey, k = jax.random.split(akey)
        actions = 0.5 * jax.random.normal(k, (N_ENVS, na))
        state, obs, _, rew, reset, _ = step(state, actions)
        obs_t.append(np.asarray(obs))
        rew_t.append(np.asarray(rew))
        done_t.append(np.asarray(reset))
        act_t.append(np.asarray(actions))
    return {
        "obs": np.stack(obs_t),
        "rew": np.stack(rew_t),
        "done": np.stack(done_t),
        "actions": np.stack(act_t),
    }


def main(tasks):
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources", "golden",
    )
    os.makedirs(out_dir, exist_ok=True)
    for task in tasks:
        arrs = trace_task(task)
        path = os.path.join(out_dir, f"{task}_trace.npz")
        np.savez_compressed(path, **arrs)
        print(f"wrote {path}: obs {arrs['obs'].shape} "
              f"resets={int(arrs['done'].sum())}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["go2", "go2_handstand", "g1", "h1", "h1_2"])
