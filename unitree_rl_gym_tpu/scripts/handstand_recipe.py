"""Staged training recipe for the shipped go2_handstand artifact (r4).

The handstand hold is a delicate unstable-equilibrium skill that PPO
erodes whenever long upright-idle episodes dominate the sample mix
(doc/handstand_r4_notes.md), so the shipped artifact is trained in
STAGES, each resuming the previous checkpoint:

  1. bootcamp   — all episodes start planted in the balanceable band
                  (RSI p=1, no mid states), sigma_0=0.5, 5000 iters:
                  learns the balance feedback (ep_len 12 -> 620)
  2. braking    — p=1 with 25% mid-transition kick-up states (planted
                  feet, consistent rotation velocity), 2500 iters:
                  learns to arrest incoming pitch rates without
                  forgetting the hold
  3. kick-up mix — mid band widened to launch angles (th 15-140 deg),
                  30% mid, p annealed 1.0 -> 0.8 over 96k steps,
                  clip 0.1, 6000 iters: preserves the hold (16/16
                  >= 5 s) under upright exposure

Run on TPU:  python -m unitree_rl_gym_tpu.scripts.handstand_recipe
Artifacts land in resources/pre_train/go2_handstand.

Each phase is a plain (cfg overrides, train overrides, iters) triple —
env semantics (rewards/termination/obs) are never touched; only the
training-time RSI distribution and PPO hyperparameters vary.
"""

import os
import shutil

from unitree_rl_gym_tpu import UNITREE_RL_GYM_TPU_ROOT_DIR

PHASES = [
    # (name, iters, env overrides, train overrides)
    ("bootcamp", 5000,
     dict(handstand_init_prob=1.0, handstand_init_prob_final=1.0,
          handstand_anneal_steps=0.0, handstand_mid_frac=0.0),
     dict(clip_param=0.2)),
    ("braking", 2500,
     dict(handstand_init_prob=1.0, handstand_init_prob_final=1.0,
          handstand_anneal_steps=0.0, handstand_mid_frac=0.25),
     dict(clip_param=0.2)),
    ("kickup_mix", 6000,
     dict(handstand_init_prob=1.0, handstand_init_prob_final=0.8,
          handstand_anneal_steps=96000.0, handstand_mid_frac=0.3,
          handstand_mid_th_deg=(15.0, 120.0),
          handstand_mid_w=(1.0, 6.0)),
     dict(clip_param=0.1)),
]


def main(out_dir=None):
    from unitree_rl_gym_tpu.envs.go2_handstand import (
        GO2HandstandEnv, go2_handstand_cfg, go2_handstand_train_cfg,
    )
    from unitree_rl_gym_tpu.export.export import export_policy
    from unitree_rl_gym_tpu.rl.runner import OnPolicyRunner

    out_dir = out_dir or os.path.join(
        UNITREE_RL_GYM_TPU_ROOT_DIR, "resources", "pre_train",
        "go2_handstand",
    )
    ckpt = None
    curves = []
    runner = None
    for name, iters, env_over, train_over in PHASES:
        cfg = go2_handstand_cfg()
        cfg.env.num_envs = 4096
        for k, v in env_over.items():
            setattr(cfg.init_state, k, v)
        tcfg = go2_handstand_train_cfg()
        tcfg.policy.init_noise_std = 0.5
        tcfg.algorithm.entropy_coef = 0.005
        for k, v in train_over.items():
            setattr(tcfg.algorithm, k, v)
        tcfg.runner.max_iterations = iters

        env = GO2HandstandEnv(cfg)
        log_dir = os.path.join("/tmp", f"handstand_{name}_logs")
        runner = OnPolicyRunner(env, tcfg, log_dir=log_dir)
        if ckpt:
            runner.load(ckpt)
        runner.learn(num_learning_iterations=iters,
                     init_at_random_ep_len=True)
        ckpt = os.path.join(log_dir, "model_phase_end.ckpt")
        runner.save(ckpt)
        import json

        cj = os.path.join(log_dir, "curves.json")
        if os.path.exists(cj):
            curves.extend(json.load(open(cj)))
        print(f"[handstand_recipe] phase {name} done ({iters} iters)")

    os.makedirs(out_dir, exist_ok=True)
    export_policy(runner, out_dir)
    import json

    json.dump(curves, open(os.path.join(out_dir, "curves.json"), "w"))
    print(f"[handstand_recipe] artifacts written to {out_dir}")


if __name__ == "__main__":
    main()
