"""PPO — TPU-native reimplementation of the rsl_rl v1.0.2 contract.

The reference trains with the external ``rsl_rl`` library pinned to v1.0.2
(SURVEY.md §1.3; doc/setup_en.md:99-106). This module reproduces its
*semantics* in functional JAX:

  * on-policy rollout of ``num_steps_per_env`` across all envs — here a
    ``lax.scan`` whose stacked outputs ARE the rollout storage (no separate
    storage object; everything stays on device)
  * time-out bootstrapping: ``rew += gamma * value * time_out`` using the
    env's ``extras["time_outs"]`` (legged_robot.py:766-768)
  * GAE(gamma=0.99, lam=0.95) with whole-batch advantage normalization
  * clipped surrogate + clipped value loss + entropy bonus
  * adaptive learning rate driven toward ``desired_kl`` per minibatch,
    multiplicative 1.5 steps clamped to [1e-5, 1e-2]
  * grad-norm clipping (max_grad_norm)
  * LSTM policies: hidden state reset on done during rollout; update
    replays the window from the stored initial carry with done-masked
    truncation (the rsl_rl trajectory-split equivalent)

The whole train iteration (rollout + GAE + epochs x minibatches) is ONE
jitted function; under pjit the env axis is sharded and gradients are
reduced by XLA-inserted collectives (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unitree_rl_gym_tpu.models import networks as nets
from unitree_rl_gym_tpu.utils.config import AlgorithmCfg


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    lr: jax.Array          # scalar, adaptive
    key: jax.Array
    # frozen anchor policy params for the skill-preserving KL penalty
    # (AlgorithmCfg.anchor_kl_coef); None unless runner.set_anchor ran
    anchor_params: Any = None


class Transition(NamedTuple):
    obs: jax.Array
    critic_obs: jax.Array
    actions: jax.Array
    rewards: jax.Array       # already time-out-bootstrapped
    dones: jax.Array
    values: jax.Array
    log_probs: jax.Array
    mu: jax.Array
    std: jax.Array


@dataclasses.dataclass(frozen=True)
class PPO:
    """Algorithm bundle: static config + pure functions."""

    net: Any                      # flax module (ActorCritic[Recurrent])
    cfg: AlgorithmCfg
    num_steps: int                # num_steps_per_env (24)
    num_envs: int
    # optional task-critical-state classifier obs -> [B] weight in [0,1]
    # (e.g. GO2HandstandEnv.ppo_state_class_fn: inverted-band states).
    # Drives cfg.class_target_frac re-weighting, and the
    # cfg.anchor_kl_coef mask unless anchor_mask_fn is given; all
    # features are inert when None.
    state_class_fn: Any = None
    # optional separate mask for the anchor-KL penalty (defaults to
    # state_class_fn). Needed when the re-weighting class must be wider
    # than the protected region: the r5 conversion work up-weights
    # transition/entry states (g_z > -0.8) so they aren't drowned by
    # upright idle, but those states must NOT be pinned to the anchor —
    # they are exactly what training must change
    # (env.ppo_anchor_mask_fn; doc/handstand_r5_notes.md finding 5).
    anchor_mask_fn: Any = None
    # critic_obs is byte-identical to obs for tasks without privileged
    # observations (go2/go2_handstand; runner sets this from
    # env.num_privileged_obs). When True the rollout stores a 0-width
    # placeholder instead of the duplicate and the update reads the
    # critic input from the obs columns — dropping 48 of ~142 packed
    # columns cuts the update's pack+permute data motion by a measured
    # ~0.7 ms/iter at 4096 envs (doc/profile_r5.md).
    share_critic_obs: bool = False

    # ------------------------------------------------------------------

    def make_optimizer(self):
        # lr is applied manually in the update (adaptive-KL schedule mutates
        # it between minibatches), so the chain stops at the adam direction.
        return optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.scale_by_adam(),
        )

    def init(self, key, obs_dim, critic_obs_dim):
        k1, k2 = jax.random.split(key)
        carry = self.net.initial_carry(self.num_envs)
        params = self.net.init(
            k1, jnp.zeros((self.num_envs, obs_dim)),
            jnp.zeros((self.num_envs, critic_obs_dim)),
            carry,
        )
        opt_state = self.make_optimizer().init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            key=k2,
        )

    # ------------------------------------------------------------------
    # rollout
    # ------------------------------------------------------------------

    def rollout(self, ts: TrainState, env, env_state, obs, critic_obs, carry):
        """Collect ``num_steps`` transitions. Returns
        (env_state, obs, critic_obs, carry, transitions [T,...], carry_start,
         ep_stats)."""
        gamma = self.cfg.gamma
        carry_start = carry

        def step_fn(c, key):
            env_state, obs, critic_obs, carry = c
            mu, std, value, new_carry = self.net.apply(
                ts.params, obs, critic_obs, carry
            )
            eps = jax.random.normal(key, mu.shape)
            actions = mu + std * eps
            logp = nets.log_prob(mu, std, actions)
            # refresh_terrain=False: window fetches are gathers and must
            # stay out of this scan (done once per rollout below)
            env_state, next_obs, next_priv, rew, done, extras = env.step(
                env_state, actions, refresh_terrain=False
            )
            next_critic = next_priv if next_priv is not None else next_obs
            # time-out bootstrap (rsl_rl process_env_step)
            rew_b = rew + gamma * value * extras["time_outs"].astype(rew.dtype)
            new_carry = nets.reset_carry(new_carry, done)
            t = Transition(
                # share_critic_obs: store a 0-width placeholder instead of
                # duplicating obs (the update reads critic input from the
                # obs columns; see _batch_critic_obs)
                obs=obs,
                critic_obs=(
                    critic_obs[:, :0] if self.share_critic_obs
                    else critic_obs
                ),
                actions=actions,
                rewards=rew_b, dones=done, values=value, log_probs=logp,
                mu=mu, std=std,
            )
            ep = (
                extras["episode_sums_at_reset"],
                extras["episode_reset_count"],
                extras["episode_length_at_reset"],
                rew,
                # curriculum telemetry (zero when absent; legged_robot.py
                # logs these via extras["episode"], :758-765)
                extras.get("terrain_level_mean", jnp.zeros(())),
                extras.get("max_command_x", jnp.zeros(())),
            )
            return (env_state, next_obs, next_critic, new_carry), (t, ep)

        keys = jax.random.split(ts.key, self.num_steps)
        c = (env_state, obs, critic_obs, carry)
        if getattr(env, "terrain", None) is None:
            c, (transitions, ep) = jax.lax.scan(step_fn, c, keys)
        else:
            # Terrain: the rollout scan is chunked around refresh_terrain
            # calls every ``terrain.window_refresh_steps`` control steps.
            # The window fetch is a gather and MUST stay outside lax.scan
            # (top-level gathers are fast; in-scan they serialize at
            # ~10 ns/element, doc/profile_r3.md), but with the small 16x16
            # windows an env walking ~1 m/s would reach the +-0.8 m window
            # edge within a 24-step rollout — so windows are re-centered
            # between chunks instead of once per rollout.
            every = int(getattr(env.cfg.terrain, "window_refresh_steps", 0))
            every = every if 0 < every < self.num_steps else self.num_steps
            bounds = list(range(0, self.num_steps, every))
            chunks = []
            for lo in bounds:
                hi = min(lo + every, self.num_steps)
                c = (env.refresh_terrain(c[0]),) + c[1:]
                c, out = jax.lax.scan(step_fn, c, keys[lo:hi])
                chunks.append(out)
            transitions, ep = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *chunks
            )
        env_state, obs, critic_obs, carry = c
        ep_stats = {
            "episode_sums": jnp.sum(ep[0], axis=0),
            "reset_count": jnp.sum(ep[1]),
            "episode_length_sum": jnp.sum(ep[2]),
            "mean_step_reward": jnp.mean(ep[3]),
            "terrain_level_mean": ep[4][-1],
            "max_command_x": ep[5][-1],
        }
        return env_state, obs, critic_obs, carry, transitions, carry_start, ep_stats

    # ------------------------------------------------------------------
    # GAE
    # ------------------------------------------------------------------

    def compute_gae(self, transitions: Transition, last_value):
        gamma, lam = self.cfg.gamma, self.cfg.lam

        # scan backward carrying (adv, next_value)
        def back2(carry, t):
            adv_next, v_next = carry
            value, rew, done = t
            nonterm = 1.0 - done.astype(value.dtype)
            delta = rew + gamma * v_next * nonterm - value
            adv = delta + gamma * lam * nonterm * adv_next
            return (adv, value), adv

        (_, _), advantages = jax.lax.scan(
            back2,
            (jnp.zeros_like(last_value), last_value),
            (transitions.values, transitions.rewards, transitions.dones),
            reverse=True,
            unroll=8,   # tiny body: loop overhead >> math at T=24
        )
        returns = advantages + transitions.values
        # whole-batch advantage normalization (rsl_rl compute_returns)
        adv_n = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        return adv_n, returns

    # ------------------------------------------------------------------
    # update
    # ------------------------------------------------------------------

    def _loss(self, params, batch, lr_unused, carry0=None, dones=None,
              anchor_params=None):
        """PPO loss on a minibatch. For recurrent nets the batch is
        [T, B, ...] and the LSTM is replayed from carry0 with done masking;
        for MLPs the batch is flat [B, ...]."""
        cfg = self.cfg
        # share_critic_obs: the stored critic_obs is a 0-width placeholder
        # and the critic input is the obs columns
        bco = (
            (lambda obs, cobs: obs) if self.share_critic_obs
            else (lambda obs, cobs: cobs)
        )
        if self.net.is_recurrent:
            T = batch.obs.shape[0]

            def replay(carry, t):
                mu, std, value, new_carry = self.net.apply(
                    params, batch.obs[t],
                    bco(batch.obs[t], batch.critic_obs[t]), carry
                )
                new_carry = nets.reset_carry(new_carry, dones[t])
                return new_carry, (mu, std, value)

            # unroll: the replay body is a tiny LSTM cell (one [mb, in+h]
            # x [in+h, 4h] matmul); at T=24 x 20 minibatch-updates the
            # per-iteration loop overhead dominates the math, so unroll
            # trades instruction count for launch latency
            _, (mu, std, value) = jax.lax.scan(
                replay, carry0, jnp.arange(T), unroll=8
            )
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            mu, std, value = flat(mu), flat(std), flat(value)
            b = jax.tree.map(flat, batch)
        else:
            b = batch
            mu, std, value, _ = self.net.apply(
                params, b.obs, bco(b.obs, b.critic_obs),
                self.net.initial_carry(b.obs.shape[0])
            )

        # per-sample weights: one-sided class rebalancing — when the
        # task-critical-state share of the minibatch falls below
        # class_target_frac, importance weights restore that share of
        # the loss mass (upright-idle samples can no longer drown the
        # hold states; doc/handstand_r4_notes.md). Mean-one normalized so
        # loss magnitudes (and the adaptive-KL scale) are untouched.
        use_w = self.state_class_fn is not None and cfg.class_target_frac > 0.0
        if use_w:
            c = jax.lax.stop_gradient(
                self.state_class_fn(b.obs).astype(b.advantages.dtype)
            )
            frac = jnp.mean(c)
            tau = cfg.class_target_frac
            # cap: an uncapped tau/frac reaches 100-1000x when the
            # critical fraction collapses and NaNs the update (E7,
            # doc/handstand_r5_notes.md finding 3)
            w1 = jnp.where(
                frac < tau,
                jnp.minimum(tau / (frac + 1e-6), cfg.class_weight_cap),
                1.0,
            )
            w0 = jnp.where(
                frac < tau, (1.0 - tau) / (1.0 - frac + 1e-6), 1.0
            )
            w = c * w1 + (1.0 - c) * w0
            w = w / jnp.mean(w)
            wmean = lambda x: jnp.mean(w * x)
        else:
            wmean = jnp.mean

        logp = nets.log_prob(mu, std, b.actions)
        ratio = jnp.exp(logp - b.log_probs)
        surr = -b.advantages * ratio
        surr_clipped = -b.advantages * jnp.clip(
            ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param
        )
        surrogate_loss = wmean(jnp.maximum(surr, surr_clipped))

        if cfg.use_clipped_value_loss:
            v_clipped = b.values + jnp.clip(
                value - b.values, -cfg.clip_param, cfg.clip_param
            )
            value_loss = wmean(
                jnp.maximum(
                    jnp.square(value - b.returns),
                    jnp.square(v_clipped - b.returns),
                )
            )
        else:
            value_loss = wmean(jnp.square(value - b.returns))

        ent = wmean(nets.entropy(std))
        loss = (
            surrogate_loss
            + cfg.value_loss_coef * value_loss
            - cfg.entropy_coef * ent
        )

        # frozen-anchor KL: on states where the anchor policy is
        # competent (state class == 1), penalize KL(anchor || pi) so the
        # consolidated skill cannot erode while the rest of state space
        # trains freely. Masked mean over class-1 samples only.
        if (
            cfg.anchor_kl_coef > 0.0
            and anchor_params is not None
            and self.state_class_fn is not None
        ):
            assert not self.net.is_recurrent, (
                "anchor_kl_coef supports feed-forward policies only"
            )
            a_mu, a_std, _, _ = self.net.apply(
                anchor_params, b.obs, bco(b.obs, b.critic_obs),
                self.net.initial_carry(b.obs.shape[0]),
            )
            akl = nets.kl_divergence(
                jax.lax.stop_gradient(a_mu), jax.lax.stop_gradient(a_std),
                mu, std,
            )
            mask_fn = self.anchor_mask_fn or self.state_class_fn
            mask = jax.lax.stop_gradient(
                mask_fn(b.obs).astype(akl.dtype)
            )
            anchor_loss = jnp.sum(mask * akl) / (jnp.sum(mask) + 1e-6)
            loss = loss + cfg.anchor_kl_coef * anchor_loss

        # the adaptive-LR KL stays UNweighted (rsl_rl scheduler semantics)
        kl = jnp.mean(nets.kl_divergence(b.mu, b.std, mu, std))
        return loss, (surrogate_loss, value_loss, kl)

    def _apply_step(self, opt, params, opt_state, lr, grads, loss, kl):
        """One optimizer application, optionally NaN-guarded
        (cfg.nan_guard): a non-finite loss/grad/kl minibatch is skipped —
        params, adam moments and the adaptive LR all keep their previous
        values — instead of NaNing every parameter through the
        global-norm clip (the E7 failure, doc/handstand_r5_notes.md).
        Returns (params, opt_state, lr, skipped_flag f32)."""
        if not self.cfg.nan_guard:
            lr = self._adapt_lr(lr, kl)
            updates, opt_state = opt.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, lr, jnp.zeros(())
        ok = (
            jnp.isfinite(loss)
            & jnp.isfinite(optax.global_norm(grads))
            & jnp.isfinite(kl)
        )
        safe = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        lr = jnp.where(ok, self._adapt_lr(lr, kl), lr)
        new_updates, new_opt = opt.update(safe, opt_state, params)
        # a skipped step must not decay the adam moments either
        opt_state = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
        )
        updates = jax.tree.map(
            lambda u: jnp.where(ok, -lr * u, 0.0), new_updates
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, lr, 1.0 - ok.astype(jnp.float32)

    def _adapt_lr(self, lr, kl):
        """rsl_rl adaptive schedule: x1.5 toward desired_kl, clamped."""
        cfg = self.cfg
        if cfg.schedule != "adaptive" or cfg.desired_kl is None:
            return lr
        lr = jnp.where(
            kl > cfg.desired_kl * 2.0, jnp.maximum(lr / 1.5, 1e-5), lr
        )
        lr = jnp.where(
            (kl < cfg.desired_kl / 2.0) & (kl > 0.0),
            jnp.minimum(lr * 1.5, 1e-2),
            lr,
        )
        return lr

    def update(self, ts: TrainState, transitions: Transition, advantages,
               returns, carry_start, key):
        """num_learning_epochs x num_mini_batches PPO steps."""
        cfg = self.cfg
        T, N = self.num_steps, self.num_envs
        opt = self.make_optimizer()

        class Batch(NamedTuple):
            obs: jax.Array
            critic_obs: jax.Array
            actions: jax.Array
            log_probs: jax.Array
            values: jax.Array
            advantages: jax.Array
            returns: jax.Array
            mu: jax.Array
            std: jax.Array

        full = Batch(
            obs=transitions.obs, critic_obs=transitions.critic_obs,
            actions=transitions.actions, log_probs=transitions.log_probs,
            values=transitions.values, advantages=advantages,
            returns=returns, mu=transitions.mu, std=transitions.std,
        )

        if self.net.is_recurrent:
            nmb = cfg.num_mini_batches
            mb_envs = N // nmb

            # Same packed-gather trick as the MLP path, along the env axis:
            # one [T, N, D_total] matrix so each minibatch is a single
            # wide column-gather instead of ~10 per-field gathers (the
            # scalar fields gather element-wise otherwise).
            cols = []
            spans = []
            off = 0
            for x in full:
                d = 1 if x.ndim == 2 else x.shape[2]
                cols.append(x[..., None] if x.ndim == 2 else x)
                spans.append((off, off + d, x.ndim == 2))
                off += d
            cols.append(transitions.dones[..., None].astype(jnp.float32))
            spans.append((off, off + 1, True))
            packed = jnp.concatenate(cols, axis=2)

            def unpack(rows):
                fields = []
                for (lo, hi, scalar) in spans:
                    f = rows[..., lo:hi]
                    fields.append(f[..., 0] if scalar else f)
                return Batch(*fields[:-1]), fields[-1]

            # rsl_rl v1.0.2 shuffles ONCE per update (RolloutStorage.
            # mini_batch_generator draws a single randperm reused by every
            # epoch): one [N]-permutation, reshaped so each scan step sees
            # its minibatch's env indices. Unlike the MLP path, the
            # minibatch axis here is axis 1 of the [T, N, D] packed tensor,
            # so the in-scan column gather ``packed[:, idx]`` copies
            # contiguous D-sized rows (~1.2 KB DMAs — the efficient
            # row-gather path, NOT the serialized element-gather path).
            # The alternative (permute the whole tensor at top level +
            # contiguous dynamic slices, the MLP mechanism) re-lays-out the
            # full ~113 MB packed tensor along a strided axis and measured
            # 3.5 ms/iter SLOWER on g1/h1_2 @4096 (35.2 vs 31.7 ms/iter —
            # the r3 regression, recovered in r4).
            # truncate before reshaping: when N % nmb != 0 the remainder
            # envs are dropped (rsl_rl's mini_batch_generator does the
            # same silently via integer division)
            perm = jax.random.permutation(key, N)[: nmb * mb_envs].reshape(
                nmb, mb_envs
            )

            def mb_step(carry, idx):
                params, opt_state, lr, stats = carry
                batch, dones_f = unpack(packed[:, idx])
                carry0 = jax.tree.map(lambda h: h[idx], carry_start)
                dones = dones_f > 0.5
                (loss, (sl, vl, kl)), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch, lr, carry0, dones, ts.anchor_params)
                params, opt_state, lr, skipped = self._apply_step(
                    opt, params, opt_state, lr, grads, loss, kl
                )
                z = lambda x: jnp.where(skipped > 0.5, 0.0, x)
                stats = (stats[0] + z(sl), stats[1] + z(vl),
                         stats[2] + z(kl), stats[3] + skipped)
                return (params, opt_state, lr, stats), None

            def epoch_step(carry, _k):
                carry, _ = jax.lax.scan(mb_step, carry, perm)
                return carry, None

        else:
            flat = jax.tree.map(
                lambda x: x.reshape((T * N,) + x.shape[2:]), full
            )
            nmb = cfg.num_mini_batches
            mb_size = (T * N) // nmb

            # Pack every per-sample field into one [T*N, D_total] matrix so
            # the minibatch shuffle is a single wide row-gather. Gathering
            # the scalar fields (advantages/returns/log_probs/values) as
            # separate f32[T*N] arrays lowers to element-wise scalar loads
            # on TPU — profiled at ~15 ms of the 46 ms train iteration at
            # 4096 envs. Rows of ~550 B DMA efficiently; column slices of
            # the gathered block fuse into the loss for free.
            cols = []
            spans = []
            off = 0
            for x in flat:
                d = 1 if x.ndim == 1 else x.shape[1]
                cols.append(x[:, None] if x.ndim == 1 else x)
                spans.append((off, off + d, x.ndim == 1))
                off += d
            packed = jnp.concatenate(cols, axis=1)

            def unpack(rows):
                fields = []
                for (lo, hi, scalar) in spans:
                    f = rows[:, lo:hi]
                    fields.append(f[:, 0] if scalar else f)
                return Batch(*fields)

            # single shuffle per update (rsl_rl v1.0.2 semantics: one
            # randperm reused across epochs) applied as ONE top-level
            # row-gather; minibatches inside the scans are contiguous
            # dynamic slices — in-scan gathers hit XLA:TPU's serialized
            # ~10 ns/element path (r3 terrain profile)
            perm = jax.random.permutation(key, T * N)
            packed_perm = packed[perm]

            def mb_step(carry, i):
                params, opt_state, lr, stats = carry
                batch = unpack(jax.lax.dynamic_slice_in_dim(
                    packed_perm, i * mb_size, mb_size, axis=0
                ))
                (loss, (sl, vl, kl)), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch, lr, None, None, ts.anchor_params)
                params, opt_state, lr, skipped = self._apply_step(
                    opt, params, opt_state, lr, grads, loss, kl
                )
                z = lambda x: jnp.where(skipped > 0.5, 0.0, x)
                stats = (stats[0] + z(sl), stats[1] + z(vl),
                         stats[2] + z(kl), stats[3] + skipped)
                return (params, opt_state, lr, stats), None

            def epoch_step(carry, _k):
                carry, _ = jax.lax.scan(mb_step, carry, jnp.arange(nmb))
                return carry, None

        zero = jnp.zeros(())
        init = (ts.params, ts.opt_state, ts.lr, (zero, zero, zero, zero))
        keys = jnp.arange(cfg.num_learning_epochs)
        (params, opt_state, lr, stats), _ = jax.lax.scan(
            epoch_step, init, keys
        )
        n_updates = cfg.num_learning_epochs * cfg.num_mini_batches
        n_applied = jnp.maximum(n_updates - stats[3], 1.0)
        metrics = {
            "surrogate_loss": stats[0] / n_applied,
            "value_loss": stats[1] / n_applied,
            "kl": stats[2] / n_applied,
            "lr": lr,
            "nonfinite_steps": stats[3],
        }
        return ts.replace(params=params, opt_state=opt_state, lr=lr), metrics

    # ------------------------------------------------------------------
    # one full training iteration (jit this)
    # ------------------------------------------------------------------

    def train_iteration(self, env, ts: TrainState, env_state, obs,
                        critic_obs, carry):
        key_next, k_update = jax.random.split(
            jax.random.fold_in(ts.key, 1), 2
        )
        env_state, obs, critic_obs, carry, transitions, carry_start, ep = (
            self.rollout(ts, env, env_state, obs, critic_obs, carry)
        )
        _, _, last_value, _ = self.net.apply(
            ts.params, obs, critic_obs, carry
        )
        advantages, returns = self.compute_gae(transitions, last_value)
        ts, metrics = self.update(
            ts, transitions, advantages, returns, carry_start, k_update
        )
        ts = ts.replace(key=key_next)
        metrics.update(ep)
        return ts, env_state, obs, critic_obs, carry, metrics
