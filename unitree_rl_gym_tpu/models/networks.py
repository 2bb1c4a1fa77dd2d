"""Actor-critic networks (flax) matching rsl_rl v1.0.2's model zoo.

The reference trains with the external ``rsl_rl`` library (SURVEY.md §1.3):
``ActorCritic`` (MLP, elu, learned state-independent log-std, init noise
std; legged_robot_config.py:247-255) and ``ActorCriticRecurrent`` (LSTM
encoder per head + small MLP; g1_config.py:92-100). These are tiny networks
— the TPU win is keeping them fused into the rollout scan, not sharding
them — so they are plain flax modules in fp32 for reproducibility.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTIVATIONS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "selu": nn.selu,
    "crelu": lambda x: jnp.concatenate([nn.relu(x), nn.relu(-x)], -1),
    "lrelu": nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
}

LOG2PI = math.log(2.0 * math.pi)


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "elu"
    dtype: str = "float32"   # matmul/activation compute dtype; params fp32

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        for h in self.hidden_dims:
            x = act(nn.Dense(h, dtype=dt, param_dtype=jnp.float32)(x))
        out = nn.Dense(self.out_dim, dtype=dt, param_dtype=jnp.float32)(x)
        return out.astype(jnp.float32)


class ActorCritic(nn.Module):
    """MLP actor-critic; Gaussian policy with learned global log-std.

    forward(obs, critic_obs) -> (mu, std, value). Asymmetric critic input
    supported (privileged obs, legged_robot_config.py:56)."""

    num_actions: int
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0
    dtype: str = "float32"

    def setup(self):
        self.actor = MLP(self.actor_hidden_dims, self.num_actions,
                         self.activation, self.dtype)
        self.critic = MLP(self.critic_hidden_dims, 1, self.activation,
                          self.dtype)
        self.log_std = self.param(
            "log_std",
            lambda key: jnp.full((self.num_actions,),
                                 math.log(self.init_noise_std),
                                 dtype=jnp.float32),
        )

    def __call__(self, obs, critic_obs=None, carry=None):
        critic_obs = obs if critic_obs is None else critic_obs
        mu = self.actor(obs)
        value = self.critic(critic_obs)[..., 0]
        std = jnp.exp(self.log_std) * jnp.ones_like(mu)
        return mu, std, value, carry

    def act(self, obs, carry=None):
        """Actor-only forward (deterministic inference / export path —
        reference helpers.py:156-160 exports just the actor)."""
        return self.actor(obs), carry

    @property
    def is_recurrent(self):
        return False

    def initial_carry(self, batch):
        return None


class LSTMEncoder(nn.Module):
    """Stacked LSTM over a single timestep; carry = ((h, c), ...) layers."""

    hidden_size: int
    num_layers: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, carry):
        new_carry = []
        dt = jnp.dtype(self.dtype)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.hidden_size, dtype=dt, param_dtype=jnp.float32,
                name=f"lstm_{i}",
            )
            c, x = cell(carry[i], x)
            new_carry.append(c)
        # carry stays fp32 across steps (rollout scan carry dtype stability)
        new_carry = jax.tree.map(lambda h: h.astype(jnp.float32),
                                 tuple(new_carry))
        return x.astype(jnp.float32), new_carry


class ActorCriticRecurrent(nn.Module):
    """LSTM actor-critic (rsl_rl ActorCriticRecurrent): separate memory
    modules for actor (memory_a) and critic (memory_c), each followed by the
    small MLP head. Carry is ((actor_layers...), (critic_layers...))."""

    num_actions: int
    actor_hidden_dims: Sequence[int] = (32,)
    critic_hidden_dims: Sequence[int] = (32,)
    activation: str = "elu"
    init_noise_std: float = 0.8
    rnn_hidden_size: int = 64
    rnn_num_layers: int = 1
    dtype: str = "float32"

    def setup(self):
        self.memory_a = LSTMEncoder(self.rnn_hidden_size, self.rnn_num_layers,
                                    self.dtype)
        self.memory_c = LSTMEncoder(self.rnn_hidden_size, self.rnn_num_layers,
                                    self.dtype)
        self.actor = MLP(self.actor_hidden_dims, self.num_actions,
                         self.activation, self.dtype)
        self.critic = MLP(self.critic_hidden_dims, 1, self.activation,
                          self.dtype)
        self.log_std = self.param(
            "log_std",
            lambda key: jnp.full((self.num_actions,),
                                 math.log(self.init_noise_std),
                                 dtype=jnp.float32),
        )

    def __call__(self, obs, critic_obs=None, carry=None):
        critic_obs = obs if critic_obs is None else critic_obs
        carry_a, carry_c = carry
        ha, carry_a = self.memory_a(obs, carry_a)
        hc, carry_c = self.memory_c(critic_obs, carry_c)
        mu = self.actor(ha)
        value = self.critic(hc)[..., 0]
        std = jnp.exp(self.log_std) * jnp.ones_like(mu)
        return mu, std, value, (carry_a, carry_c)

    def act(self, obs, carry):
        """Actor-only forward: runs memory_a + actor head, leaves the
        critic branch untouched (export contract, helpers.py:163-182)."""
        carry_a, carry_c = carry
        ha, carry_a = self.memory_a(obs, carry_a)
        return self.actor(ha), (carry_a, carry_c)

    @property
    def is_recurrent(self):
        return True

    def initial_carry(self, batch):
        def layers():
            return tuple(
                (jnp.zeros((batch, self.rnn_hidden_size)),
                 jnp.zeros((batch, self.rnn_hidden_size)))
                for _ in range(self.rnn_num_layers)
            )
        return (layers(), layers())


def reset_carry(carry, done):
    """Zero LSTM states of done envs (rsl_rl Memory.reset(dones))."""
    if carry is None:
        return None
    return jax.tree.map(
        lambda h: jnp.where(done[:, None], 0.0, h), carry
    )


# --- Gaussian policy helpers -------------------------------------------------


def log_prob(mu, std, actions):
    z = (actions - mu) / std
    return jnp.sum(-0.5 * z * z - jnp.log(std) - 0.5 * LOG2PI, axis=-1)


def entropy(std):
    return jnp.sum(0.5 + 0.5 * LOG2PI + jnp.log(std), axis=-1)


def kl_divergence(mu_old, std_old, mu_new, std_new):
    """rsl_rl's adaptive-KL formula (PPO.update, v1.0.2)."""
    return jnp.sum(
        jnp.log(std_new / std_old + 1e-5)
        + (std_old**2 + (mu_old - mu_new) ** 2) / (2.0 * std_new**2)
        - 0.5,
        axis=-1,
    )


def build_network(policy_cfg, num_actions):
    """Instantiate from TrainCfg.policy + runner.policy_class_name."""
    if getattr(policy_cfg, "_class_name", None) == "ActorCriticRecurrent":
        return ActorCriticRecurrent(
            num_actions=num_actions,
            actor_hidden_dims=tuple(policy_cfg.actor_hidden_dims),
            critic_hidden_dims=tuple(policy_cfg.critic_hidden_dims),
            activation=policy_cfg.activation,
            init_noise_std=policy_cfg.init_noise_std,
            rnn_hidden_size=policy_cfg.rnn_hidden_size,
            rnn_num_layers=policy_cfg.rnn_num_layers,
            dtype=getattr(policy_cfg, "dtype", "float32"),
        )
    return ActorCritic(
        num_actions=num_actions,
        actor_hidden_dims=tuple(policy_cfg.actor_hidden_dims),
        critic_hidden_dims=tuple(policy_cfg.critic_hidden_dims),
        activation=policy_cfg.activation,
        init_noise_std=policy_cfg.init_noise_std,
        dtype=getattr(policy_cfg, "dtype", "float32"),
    )
