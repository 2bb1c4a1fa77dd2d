"""OnPolicyRunner — training driver (rsl_rl v1.0.2 runner contract).

Reproduces the runner surface the reference exercises
(task_registry.py:119, train.py:14, play.py:32-34, helpers.py:151-168):

    runner = OnPolicyRunner(env, train_cfg, log_dir)
    runner.learn(num_learning_iterations, init_at_random_ep_len=True)
    runner.save(path) / runner.load(path)
    policy = runner.get_inference_policy()

The whole train iteration (24-step rollout + GAE + 5x4 PPO minibatch
updates) is ONE jitted function; the host only reads back scalar metrics
for TensorBoard, so the device never idles on Python. Checkpoints are
msgpack pytrees named ``model_<iteration>.ckpt`` every ``save_interval``
iterations (legged_robot_config.py:279-281 semantics).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from unitree_rl_gym_tpu.models import networks as nets
from unitree_rl_gym_tpu.rl.ppo import PPO, TrainState
from unitree_rl_gym_tpu.utils.config import TrainCfg, class_to_dict


class OnPolicyRunner:
    def __init__(self, env, train_cfg: TrainCfg, log_dir: Optional[str] = None,
                 device=None):
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        self.current_learning_iteration = 0

        policy_cfg = train_cfg.policy
        policy_cfg._class_name = train_cfg.runner.policy_class_name
        self.net = nets.build_network(policy_cfg, env.num_actions)
        self.alg = PPO(
            net=self.net,
            cfg=train_cfg.algorithm,
            num_steps=train_cfg.runner.num_steps_per_env,
            num_envs=env.num_envs,
            # tasks can expose a task-critical-state classifier that
            # drives class_target_frac re-weighting and the anchor-KL
            # mask (AlgorithmCfg; GO2HandstandEnv.ppo_state_class_fn)
            state_class_fn=getattr(env, "ppo_state_class_fn", None),
            anchor_mask_fn=getattr(env, "ppo_anchor_mask_fn", None),
            # tasks without privileged observations feed the critic the
            # actor's obs; don't store/pack/permute the duplicate
            share_critic_obs=env.num_privileged_obs is None,
        )
        critic_obs_dim = env.num_privileged_obs or env.num_obs
        key = jax.random.PRNGKey(train_cfg.seed)
        self.train_state = self.alg.init(key, env.num_obs, critic_obs_dim)

        # multi-chip env-batch data parallelism (SURVEY.md §2.3): shard the
        # env axis over the ("env",) mesh, replicate params; XLA inserts the
        # psum gradient collectives inside the jitted train iteration.
        from unitree_rl_gym_tpu.parallel import mesh as pmesh

        self.mesh = pmesh.auto_mesh()
        if self.mesh is not None:
            pmesh.set_env_mesh(self.mesh)
            self.train_state = pmesh.replicate(self.train_state, self.mesh)
            print(f"[runner] env axis sharded over {self.mesh.size} devices")

        self._iter_fn = jax.jit(
            lambda ts, es, obs, cobs, carry: self.alg.train_iteration(
                self.env, ts, es, obs, cobs, carry
            )
        )
        self._env_state = None
        self._obs = None
        self._critic_obs = None
        self._carry = None
        self._writer = None
        # reward-vs-iteration curve, dumped as curves.json next to the
        # checkpoints so convergence is auditable without TensorBoard
        # (BASELINE.md "matched reward-at-iteration curves")
        self._curves = []

    # ------------------------------------------------------------------

    def _ensure_env(self, init_at_random_ep_len=False, key=None):
        if self._env_state is None:
            key = key or jax.random.PRNGKey(self.cfg.seed + 1)
            state, obs = self.env.reset_all(
                key, init_at_random_ep_len=init_at_random_ep_len
            )
            self._env_state = state
            self._obs = obs
            self._critic_obs = (
                state.priv_obs if state.priv_obs is not None else obs
            )
            self._carry = self.net.initial_carry(self.env.num_envs)
            if self.mesh is not None:
                from unitree_rl_gym_tpu.parallel import mesh as pmesh

                self._env_state = pmesh.shard_env_state(
                    self._env_state, self.mesh
                )
                es = pmesh.env_sharding(self.mesh)
                self._obs = jax.device_put(self._obs, es)
                self._critic_obs = jax.device_put(self._critic_obs, es)
                if self._carry is not None:
                    self._carry = pmesh.shard_env_state(
                        self._carry, self.mesh
                    )

    def learn(self, num_learning_iterations: int,
              init_at_random_ep_len: bool = False):
        self._ensure_env(init_at_random_ep_len)
        if jax.process_index() != 0:
            self.log_dir = None  # multi-host: only process 0 writes
        if self.log_dir and self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(log_dir=self.log_dir, flush_secs=10)
            except Exception as e:  # tensorboard optional
                print(f"[runner] tensorboard writer unavailable: {e}")
        start = self.current_learning_iteration
        steps_per_iter = self.env.num_envs * self.cfg.runner.num_steps_per_env
        profile_iters = int(os.environ.get("UTRL_PROFILE_ITERS", 0))
        profiler_ctx = None
        # Logging runs one iteration behind the device: the jitted
        # iteration is dispatched asynchronously, and iteration i's
        # metrics are fetched/printed while iteration i+1 executes, so
        # the chip never idles on the host's console/TensorBoard work
        # (measured ~1.45M steps/s with a per-iteration sync vs ~2.1M
        # for the bare train iteration).
        pending = None  # (it, device metrics, dispatch timestamp)

        def flush(p):
            pit, pmetrics, pt0 = p
            pm = jax.device_get(pmetrics)   # blocks until iter pit is done
            pdt = time.time() - pt0
            self._log(pit, pm, steps_per_iter / pdt, pdt)

        for it in range(start, start + num_learning_iterations):
            if profile_iters and it == start + 1:
                from unitree_rl_gym_tpu.utils.profiling import trace

                if pending is not None:
                    flush(pending)
                    pending = None
                profiler_ctx = trace(
                    os.path.join(self.log_dir or ".", "profile")
                )
                profiler_ctx.__enter__()
            t0 = time.time()
            (self.train_state, self._env_state, self._obs, self._critic_obs,
             self._carry, metrics) = self._iter_fn(
                self.train_state, self._env_state, self._obs,
                self._critic_obs, self._carry,
            )
            self.current_learning_iteration = it + 1
            if pending is not None:
                flush(pending)
            pending = (it, metrics, t0)
            if (
                profiler_ctx is not None
                and it == start + profile_iters
            ):
                flush(pending)
                pending = None
                profiler_ctx.__exit__(None, None, None)
                profiler_ctx = None
                print(f"[runner] profile written to {self.log_dir}/profile")
            if self.log_dir and (
                (it + 1) % self.cfg.runner.save_interval == 0
            ):
                if pending is not None:
                    flush(pending)
                    pending = None
                self.save(
                    os.path.join(self.log_dir, f"model_{it + 1}.ckpt")
                )
        if pending is not None:
            flush(pending)
        if self.log_dir:
            self.save(os.path.join(
                self.log_dir, f"model_{self.current_learning_iteration}.ckpt"
            ))

    # ------------------------------------------------------------------

    def _log(self, it, metrics, fps, dt_wall):
        count = max(float(metrics["reset_count"]), 1.0)
        ep_rews = {
            name: float(s) / count / self.env.max_episode_length_s
            for name, s in zip(
                self.env.episode_term_names, metrics["episode_sums"]
            )
        }
        mean_ep_len = float(metrics["episode_length_sum"]) / count
        msg = (
            f"it {it:5d} | {fps:9.0f} steps/s | rew {float(metrics['mean_step_reward']):.4f} | "
            f"ep_len {mean_ep_len:7.1f} | vloss {float(metrics['value_loss']):.4f} | "
            f"kl {float(metrics['kl']):.4f} | lr {float(metrics['lr']):.2e}"
        )
        print(msg, flush=True)
        row = {
            "it": it,
            "mean_step_reward": round(float(metrics["mean_step_reward"]), 6),
            "mean_episode_length": round(mean_ep_len, 2),
            "value_loss": round(float(metrics["value_loss"]), 6),
            "kl": round(float(metrics["kl"]), 6),
            "fps": round(fps, 1),
            "episode_rew": {k: round(v, 6) for k, v in ep_rews.items()},
        }
        # curriculum telemetry (extras["episode"] schema,
        # legged_robot.py:758-765): only meaningful when the env runs the
        # corresponding curriculum
        if getattr(self.env, "terrain", None) is not None:
            row["terrain_level"] = round(
                float(metrics["terrain_level_mean"]), 4
            )
        if self.env.cfg.commands.curriculum:
            row["max_command_x"] = round(float(metrics["max_command_x"]), 4)
        self._curves.append(row)
        if self._writer is not None:
            w = self._writer
            for name, v in ep_rews.items():
                w.add_scalar(f"Episode/rew_{name}", v, it)
            w.add_scalar("Loss/value_function", float(metrics["value_loss"]), it)
            w.add_scalar("Loss/surrogate", float(metrics["surrogate_loss"]), it)
            w.add_scalar("Loss/learning_rate", float(metrics["lr"]), it)
            w.add_scalar("Perf/total_fps", fps, it)
            w.add_scalar("Train/mean_reward", float(metrics["mean_step_reward"]), it)
            w.add_scalar("Train/mean_episode_length", mean_ep_len, it)
            if getattr(self.env, "terrain", None) is not None:
                w.add_scalar(
                    "Episode/terrain_level",
                    float(metrics["terrain_level_mean"]), it,
                )

    # ------------------------------------------------------------------
    # checkpointing (msgpack pytree; §5.4 semantics)
    # ------------------------------------------------------------------

    def save(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "params": self.train_state.params,
            "opt_state": self.train_state.opt_state,
            "lr": self.train_state.lr,
            "key": self.train_state.key,
            "iteration": self.current_learning_iteration,
        }
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        meta = {
            "iteration": self.current_learning_iteration,
            "train_cfg": class_to_dict(self.cfg),
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1, default=str)
        if self._curves and os.path.dirname(path):
            with open(os.path.join(os.path.dirname(path),
                                   "curves.json"), "w") as f:
                json.dump(self._curves, f)

    def load(self, path: str, load_optimizer: bool = True):
        with open(path, "rb") as f:
            raw = f.read()
        template = {
            "params": self.train_state.params,
            "opt_state": self.train_state.opt_state,
            "lr": self.train_state.lr,
            "key": self.train_state.key,
            "iteration": 0,
        }
        payload = serialization.from_bytes(template, raw)
        self.train_state = self.train_state.replace(
            params=payload["params"],
            opt_state=(payload["opt_state"] if load_optimizer
                       else self.train_state.opt_state),
            lr=jnp.asarray(payload["lr"]),
        )
        self.current_learning_iteration = int(payload["iteration"])
        return payload

    # ------------------------------------------------------------------

    def set_anchor(self, params=None):
        """Freeze a copy of ``params`` (default: the CURRENT policy) as
        the anchor for AlgorithmCfg.anchor_kl_coef. The anchor rides in
        TrainState so it flows through the jitted iteration; setting it
        retraces once."""
        p = params if params is not None else self.train_state.params
        p = jax.tree.map(jnp.asarray, p)
        if self.mesh is not None and params is not None:
            from unitree_rl_gym_tpu.parallel import mesh as pmesh

            p = pmesh.replicate(p, self.mesh)
        self.train_state = self.train_state.replace(anchor_params=p)

    def get_inference_policy(self, device=None):
        """Deterministic (mean) policy; LSTM carry is held inside the
        closure like the reference's exported stateful module
        (helpers.py:163-182)."""
        params = self.train_state.params
        # inference/export is always fp32 (the deploy stack is fp32; the
        # bf16 compute dtype is a training-throughput knob only)
        net = self.net.clone(dtype="float32")
        carry_holder = {"carry": None}

        @jax.jit
        def _apply(params, obs, carry):
            return net.apply(params, obs, carry, method=net.act)

        def policy(obs):
            if carry_holder["carry"] is None:
                carry_holder["carry"] = net.initial_carry(obs.shape[0])
            mu, carry_holder["carry"] = _apply(
                params, obs, carry_holder["carry"]
            )
            return mu

        def reset_memory():
            carry_holder["carry"] = None

        policy.reset_memory = reset_memory
        return policy
