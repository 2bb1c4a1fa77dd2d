"""Policy export (reference: helpers.py:150-189 export_policy_as_jit).

Produces two artifacts so every reference deploy path keeps working:

1. **Flat-weight artifact** ``policy_flat.npz`` + metadata — consumed by the
   numpy inference shim (:mod:`unitree_rl_gym_tpu.export.numpy_policy`) and
   the C++ deploy controller (no torch required at the edge).
2. **TorchScript** ``policy_1.pt`` (MLP) / ``policy_lstm_1.pt`` (LSTM) —
   byte-compatible with what the reference's deploy consumers load
   (deploy_mujoco.py:77 ``torch.jit.load``, Controller.cpp:34 LibTorch):
   the flax weights are copied into a minimal torch module; the LSTM export
   carries hidden/cell state in registered buffers updated inside forward()
   and exposes ``reset_memory()`` (helpers.py:163-182).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def _flatten_params(params) -> Dict[str, np.ndarray]:
    import jax.tree_util as jtu

    out = {}
    for path, leaf in jtu.tree_leaves_with_path(params):
        key = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def load_flat_params(path: str):
    """Rebuild the nested flax params pytree from a ``policy_flat.npz``
    (inverse of :func:`_flatten_params` for dict-keyed trees). The npz
    carries the FULL train params (actor + critic + log_std), so a
    shipped artifact can seed a fine-tune (e.g. the handstand robustness
    recipe resumes from the 16/16 holder instead of retraining)."""
    f = path if path.endswith(".npz") else os.path.join(
        path, "policy_flat.npz"
    )
    z = np.load(f)
    out: Dict = {}
    for key in z.files:
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(z[key])
    return out


def export_flat(runner, path: str):
    """Flat npz of all params + architecture metadata json."""
    os.makedirs(path, exist_ok=True)
    flat = _flatten_params(runner.train_state.params)
    np.savez(os.path.join(path, "policy_flat.npz"), **flat)
    pc = runner.cfg.policy
    meta = {
        "policy_class": runner.cfg.runner.policy_class_name,
        "num_actions": runner.env.num_actions,
        "num_obs": runner.env.num_obs,
        "actor_hidden_dims": list(pc.actor_hidden_dims),
        "activation": pc.activation,
        "rnn_hidden_size": pc.rnn_hidden_size,
        "rnn_num_layers": pc.rnn_num_layers,
        "is_recurrent": runner.net.is_recurrent,
    }
    # record the deploy obs segment table when this policy uses the shared
    # 50 Hz deploy layout (deploy/obs_layout.py) so consumers never have to
    # hand-code offsets
    try:
        from unitree_rl_gym_tpu.deploy import obs_layout

        meta["obs_layout"] = obs_layout.layout_for(
            runner.env.num_obs, runner.env.num_actions
        ).to_meta()
    except ValueError:
        meta["obs_layout"] = None  # task-specific layout (e.g. go2 48-dim)
    with open(os.path.join(path, "policy_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def _actor_mlp_to_torch(params, hidden_dims, activation):
    import torch
    import torch.nn as tnn

    acts = {"elu": tnn.ELU, "relu": tnn.ReLU, "tanh": tnn.Tanh,
            "selu": tnn.SELU, "sigmoid": tnn.Sigmoid,
            "lrelu": tnn.LeakyReLU}
    actor = params["params"]["actor"]
    layers = []
    n = len(hidden_dims)
    for i in range(n + 1):
        k = np.asarray(actor[f"Dense_{i}"]["kernel"])
        b = np.asarray(actor[f"Dense_{i}"]["bias"])
        lin = tnn.Linear(k.shape[0], k.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(k.T.copy()))
            lin.bias.copy_(torch.from_numpy(b.copy()))
        layers.append(lin)
        if i < n:
            layers.append(acts[activation]())
    return tnn.Sequential(*layers)


def _lstm_to_torch(params, scope, input_dim, hidden, num_layers):
    """Copy flax OptimizedLSTMCell weights (gates ii/if/ig/io + hi/hf/hg/ho,
    bias on the hidden half) into a torch.nn.LSTM."""
    import torch
    import torch.nn as tnn

    lstm = tnn.LSTM(input_dim, hidden, num_layers)
    mem = params["params"][scope]
    with torch.no_grad():
        for l in range(num_layers):
            cell = mem[f"lstm_{l}"]
            w_ih = np.concatenate(
                [np.asarray(cell[g]["kernel"]).T for g in
                 ("ii", "if", "ig", "io")], axis=0
            )
            w_hh = np.concatenate(
                [np.asarray(cell[g]["kernel"]).T for g in
                 ("hi", "hf", "hg", "ho")], axis=0
            )
            b_hh = np.concatenate(
                [np.asarray(cell[g]["bias"]) for g in
                 ("hi", "hf", "hg", "ho")], axis=0
            )
            getattr(lstm, f"weight_ih_l{l}").copy_(torch.from_numpy(w_ih.copy()))
            getattr(lstm, f"weight_hh_l{l}").copy_(torch.from_numpy(w_hh.copy()))
            getattr(lstm, f"bias_ih_l{l}").zero_()
            getattr(lstm, f"bias_hh_l{l}").copy_(torch.from_numpy(b_hh.copy()))
    return lstm


def export_cpp_bin(runner, path: str):
    """Flat binary for the C++ deploy controller (deploy/cpp/policy.cpp).

    Layout (v1, little-endian):
      u32 magic 'UTRL', u32 version=1, u32 is_recurrent, u32 num_obs,
      u32 num_actions, u32 rnn_hidden, u32 rnn_layers, u32 n_mlp_layers,
      u32 activation(0=elu);
      per LSTM layer: u32 in, u32 hidden, f32 w_ih[in,4H], f32 w_hh[h,4H],
        f32 bias[4H] (gate order i|f|g|o);
      per MLP layer: u32 in, u32 out, f32 kernel[in,out], f32 bias[out].
    """
    import struct

    os.makedirs(path, exist_ok=True)
    params = runner.train_state.params
    pc = runner.cfg.policy
    recurrent = runner.net.is_recurrent
    n_mlp = len(pc.actor_hidden_dims) + 1
    out_path = os.path.join(path, "policy.bin")
    with open(out_path, "wb") as f:
        f.write(struct.pack(
            "<9I", 0x4C525455, 1, int(recurrent),
            runner.env.num_obs, runner.env.num_actions,
            pc.rnn_hidden_size if recurrent else 0,
            pc.rnn_num_layers if recurrent else 0,
            n_mlp, 0,
        ))
        if recurrent:
            mem = params["params"]["memory_a"]
            for l in range(pc.rnn_num_layers):
                cell = mem[f"lstm_{l}"]
                w_ih = np.concatenate(
                    [np.asarray(cell[g]["kernel"]) for g in
                     ("ii", "if", "ig", "io")], axis=1
                ).astype("<f4")
                w_hh = np.concatenate(
                    [np.asarray(cell[g]["kernel"]) for g in
                     ("hi", "hf", "hg", "ho")], axis=1
                ).astype("<f4")
                bias = np.concatenate(
                    [np.asarray(cell[g]["bias"]) for g in
                     ("hi", "hf", "hg", "ho")]
                ).astype("<f4")
                f.write(struct.pack("<2I", w_ih.shape[0], pc.rnn_hidden_size))
                f.write(w_ih.tobytes())
                f.write(w_hh.tobytes())
                f.write(bias.tobytes())
        actor = params["params"]["actor"]
        for i in range(n_mlp):
            k = np.asarray(actor[f"Dense_{i}"]["kernel"]).astype("<f4")
            b = np.asarray(actor[f"Dense_{i}"]["bias"]).astype("<f4")
            f.write(struct.pack("<2I", k.shape[0], k.shape[1]))
            f.write(k.tobytes())
            f.write(b.tobytes())
    return out_path


def export_policy(runner, path: str):
    """Export both artifact flavors. Returns the metadata dict."""
    meta = export_flat(runner, path)
    export_cpp_bin(runner, path)
    try:
        import torch
    except Exception as e:
        print(f"[export] torch unavailable, skipping TorchScript: {e}")
        return meta
    params = runner.train_state.params
    pc = runner.cfg.policy
    if runner.net.is_recurrent:
        _export_lstm_torchscript(runner, params, pc, path)
    else:
        actor = _actor_mlp_to_torch(
            params, pc.actor_hidden_dims, pc.activation
        )
        import torch
        scripted = torch.jit.script(actor)
        scripted.save(os.path.join(path, "policy_1.pt"))
    return meta


def _export_lstm_torchscript(runner, params, pc, path):
    import torch
    import torch.nn as tnn

    class PolicyExporterLSTM(tnn.Module):
        """Stateful single-env LSTM policy (helpers.py:163-182 contract)."""

        def __init__(self, memory, actor, hidden, layers):
            super().__init__()
            self.memory = memory
            self.actor = actor
            self.register_buffer(
                "hidden_state", torch.zeros(layers, 1, hidden)
            )
            self.register_buffer(
                "cell_state", torch.zeros(layers, 1, hidden)
            )

        def forward(self, x):
            out, (h, c) = self.memory(
                x.unsqueeze(0), (self.hidden_state, self.cell_state)
            )
            self.hidden_state[:] = h
            self.cell_state[:] = c
            return self.actor(out.squeeze(0))

        @torch.jit.export
        def reset_memory(self):
            self.hidden_state[:] = 0.0
            self.cell_state[:] = 0.0

    memory = _lstm_to_torch(
        params, "memory_a", runner.env.num_obs,
        pc.rnn_hidden_size, pc.rnn_num_layers,
    )
    actor = _actor_mlp_to_torch(params, pc.actor_hidden_dims, pc.activation)
    mod = PolicyExporterLSTM(
        memory, actor, pc.rnn_hidden_size, pc.rnn_num_layers
    )
    scripted = torch.jit.script(mod)
    scripted.save(os.path.join(path, "policy_lstm_1.pt"))
