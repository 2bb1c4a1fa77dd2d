"""Round-5 handstand MuJoCo-transfer robustness fine-tune.

The r4 artifact holds a REAL handstand in the training engine (16/16
envs >= 5 s reset-aware) but its balance feedback over-rotates in MuJoCo
within ~1 s — a marginally-stable skill tuned to one engine's dynamics
(tests/test_go2_sim2sim.py xfail). The r4-VERDICT prescription: mild
dynamics DR as a FINE-TUNE of the working holder (the r4 from-scratch
stiffness-DR attempt collapsed a recipe that had no hold to protect),
with MuJoCo-in-the-loop eval for model selection.

DR used here (all per-env, fused in the step):
  * contact-stiffness x0.7-1.5 (mild; the x0.5-3.0 range collapsed
    training in r4)
  * friction 0.3-1.25
  * push impulses every ~3 s at 0.4 m/s during holds
The anchor-KL knob is kept WEAK (the policy must be allowed to change
its feedback to become robust) and the class re-weighting on.

Model selection per EVAL_EVERY iters:
  * in-engine hold rate (reset-aware, >= 50% acceptance bar)
  * MuJoCo transfer rate: up to 8 balanced holding states captured from
    the training engine are transplanted into MuJoCo
    (deploy_mujoco/go2_scene.run_go2_handstand) and must keep
    g_z > 0.2 and base > 0.3 m for 4 s
Best = (transfer_rate, hold_rate) lexicographic with hold >= 0.5.

Usage:  python -m unitree_rl_gym_tpu.scripts.handstand_transfer_r5 \
            [--src resources/pre_train/go2_handstand] [--iters 6000]
Reference: the verification ladder itself, README.md:28-35.
"""

import argparse
import json
import os
import shutil

import numpy as np

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR
from unitree_rl_gym_tpu.scripts.handstand_kickup_r5 import ART, Evaluator

EVAL_EVERY = 500
N_EVAL = 16


def _mujoco_policy(params, tmp_dir):
    """Write a flat artifact for the dependency-free numpy shim (the
    same code path deploy uses)."""
    from unitree_rl_gym_tpu.export.export import _flatten_params
    from unitree_rl_gym_tpu.export.numpy_policy import NumpyPolicy

    os.makedirs(tmp_dir, exist_ok=True)
    np.savez(os.path.join(tmp_dir, "policy_flat.npz"),
             **_flatten_params(params))
    shutil.copy(os.path.join(ART, "policy_meta.json"),
                os.path.join(tmp_dir, "policy_meta.json"))
    p = NumpyPolicy(tmp_dir)
    return lambda obs: np.asarray(p(obs[None])[0])


class TransferEval:
    """Capture balanced holding states on-device, replay them in MuJoCo."""

    def __init__(self, ev: Evaluator):
        self.ev = ev
        self._cap_fn = None

    def _capture(self, params, net, settle=150, seed=3):
        import jax
        import jax.numpy as jnp

        env = self.ev._env(1.0)
        if self._cap_fn is None:
            net32 = net.clone(dtype="float32")

            def rollout(params, seed):
                state, obs = env.reset_all(jax.random.PRNGKey(seed))

                def body(c, _):
                    state, obs, carry = c
                    mu, carry = net32.apply(
                        params, obs, carry, method=net32.act
                    )
                    state, obs, _, _, done, _ = env.step(state, mu)
                    return (state, obs, carry), done

                carry0 = net32.initial_carry(obs.shape[0])
                (state, obs, _), dones = jax.lax.scan(
                    body, (state, obs, carry0), None, length=settle
                )
                return state.phys, obs, dones

            self._cap_fn = jax.jit(rollout)
        phys, obs, dones = self._cap_fn(params, seed)
        phys = jax.device_get(phys)
        # a valid capture = termination-free for the trailing 2.5 s
        # (100 steps): under RSI p=1 a spawn-settling termination in the
        # first steps just resets into another inverted start, and the
        # final state can still be a clean hold — requiring no done over
        # the WHOLE window captured zero states from a 16/16 holder
        alive = ~np.asarray(dones)[-100:].any(axis=0)
        gz = np.asarray(obs[:, 5])
        h = np.asarray(phys.base_pos[:, 2])
        held = np.nonzero(alive & (gz > 0.2) & (h > 0.3))[0]
        states = [
            (
                np.asarray(phys.base_pos[i]),
                np.asarray(phys.base_quat[i]),
                np.asarray(phys.joint_q[i]),
                np.asarray(phys.v[i, 0:3]),
                np.asarray(phys.v[i, 3:6]),
                np.asarray(phys.v[i, 6:]),
            )
            for i in held[:8]
        ]
        return states

    def transfer_rate(self, params, net, tmp_dir):
        from unitree_rl_gym_tpu.deploy.deploy_mujoco.go2_scene import (
            run_go2_handstand,
        )

        states = self._capture(params, net)
        if not states:
            return 0.0, 0
        policy = _mujoco_policy(params, tmp_dir)
        ok = 0
        for st in states:
            out = run_go2_handstand(policy, init_state=st, duration_s=4.0)
            if float(out["g_z"].min()) > 0.2 and float(
                out["height"].min()
            ) > 0.3:
                ok += 1
        return ok / len(states), len(states)


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.export.export import (
        export_policy, load_flat_params,
    )
    from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=ART,
                    help="flat artifact dir to fine-tune from")
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--out", default="/tmp/handstand_transfer_r5")
    ap.add_argument("--anchor-coef", type=float, default=0.3)
    ap.add_argument("--stiff", type=float, nargs=2, default=(0.7, 1.5))
    ap.add_argument("--push-interval", type=float, default=3.0)
    ap.add_argument("--push-vel", type=float, default=0.4)
    # r5 second pass: the contact/friction/push-only run kept the
    # in-engine hold at 1.00 yet transferred 0/8 — over-rotation in
    # MuJoCo is a feedback-LOOP symptom, so randomize the loop itself
    # (per-env kp scale + 1-step actuation delay, DomainRandCfg)
    ap.add_argument("--pd-gain", type=float, nargs=2, default=None,
                    help="enable per-env proportional-gain DR, e.g. "
                         "--pd-gain 0.8 1.2")
    ap.add_argument("--delay-prob", type=float, default=0.0,
                    help="fraction of envs actuating with a "
                         "1-control-step delay")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg, tcfg = task_registry.get_cfgs("go2_handstand")
    cfg.env.num_envs = 4096
    cfg.init_state.handstand_init_prob = 1.0
    cfg.init_state.handstand_init_prob_final = 1.0
    cfg.init_state.handstand_anneal_steps = 0.0
    cfg.init_state.handstand_mid_frac = 0.25
    cfg.domain_rand.randomize_contact_stiffness = True
    cfg.domain_rand.contact_stiffness_range = tuple(args.stiff)
    cfg.domain_rand.randomize_friction = True
    cfg.domain_rand.friction_range = (0.3, 1.25)
    cfg.domain_rand.push_robots = True
    cfg.domain_rand.push_interval_s = args.push_interval
    cfg.domain_rand.max_push_vel_xy = args.push_vel
    if args.pd_gain is not None:
        cfg.domain_rand.randomize_pd_gain = True
        cfg.domain_rand.pd_gain_range = tuple(args.pd_gain)
    cfg.domain_rand.action_delay_prob = args.delay_prob
    tcfg.policy.init_noise_std = 0.5
    tcfg.algorithm.entropy_coef = 0.005
    tcfg.algorithm.nan_guard = True
    tcfg.algorithm.anchor_kl_coef = args.anchor_coef
    tcfg.algorithm.class_target_frac = 0.5
    tcfg.runner.max_iterations = args.iters
    tcfg.runner.save_interval = 10 ** 9

    env = task_registry.get_task_class("go2_handstand")(cfg)
    runner = OnPolicyRunner(env, tcfg, log_dir=os.path.join(args.out, "logs"))
    src = load_flat_params(args.src)
    runner.train_state = runner.train_state.replace(
        params=jax.tree.map(
            lambda a, b: np.asarray(b, dtype=a.dtype),
            runner.train_state.params, src,
        )
    )
    runner.set_anchor()

    ev = Evaluator()
    tev = TransferEval(ev)
    tmp = os.path.join(args.out, "mj_policy")

    def evaluate(tag):
        r = ev.rates(runner.train_state.params, runner.net)
        tr, n = tev.transfer_rate(runner.train_state.params, runner.net, tmp)
        print(f"[transfer] {tag}: hold {r['hold_rate']:.2f} "
              f"conv {r['conv_rate']:.2f} transfer {tr:.2f} ({n} states)",
              flush=True)
        return dict(hold_rate=r["hold_rate"], conv_rate=r["conv_rate"],
                    transfer_rate=tr, n_transfer_states=n)

    history = [dict(it=0, **evaluate("baseline"))]
    best = dict(score=(-1.0, -1.0), it=0)
    for lo in range(0, args.iters, EVAL_EVERY):
        n = min(EVAL_EVERY, args.iters - lo)
        runner.learn(n, init_at_random_ep_len=True)
        it = runner.current_learning_iteration
        r = evaluate(f"it {it}")
        history.append(dict(it=it, **r))
        score = (r["transfer_rate"] if r["hold_rate"] >= 0.5 else -1.0,
                 r["hold_rate"])
        if score > tuple(best["score"]):
            best = dict(score=list(score), it=it, rates=r)
            runner.save(os.path.join(args.out, "best.ckpt"))
            export_policy(runner, os.path.join(args.out, "best_export"))
        json.dump(dict(history=history, best=best),
                  open(os.path.join(args.out, "campaign.json"), "w"),
                  indent=1)
    print(f"[transfer] done. best it {best['it']} score {best['score']}",
          flush=True)


if __name__ == "__main__":
    main()
