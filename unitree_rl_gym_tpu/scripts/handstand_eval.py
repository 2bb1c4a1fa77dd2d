"""Multi-seed handstand capability eval (r4 VERDICT weak #6: the 16/16
hold claim rested on one seed).

Evaluates a flat artifact dir across several reset seeds with the
reset-aware criteria (tests/test_pretrained_go2 semantics) and prints a
per-seed capability table for doc/handstand_r5_notes.md. The pinned
seed-0 regression gate stays in the test suite; this is the capability
statement.

    python -m unitree_rl_gym_tpu.scripts.handstand_eval \
        [--src resources/pre_train/go2_handstand] [--seeds 0 1 2 3 4]
"""

import argparse
import json

import numpy as np

from unitree_rl_gym_tpu.scripts.handstand_kickup_r5 import ART, Evaluator


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from unitree_rl_gym_tpu.envs.registry import task_registry
    from unitree_rl_gym_tpu.export.export import load_flat_params
    from unitree_rl_gym_tpu.models import networks as nets

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=ART)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    args = ap.parse_args()

    _, tcfg = task_registry.get_cfgs("go2_handstand")
    tcfg.policy._class_name = tcfg.runner.policy_class_name
    net = nets.build_network(tcfg.policy, 12)
    params = load_flat_params(args.src)

    ev = Evaluator()
    rows = []
    for seed in args.seeds:
        r = ev.rates(params, net, seed=seed)
        rows.append(dict(seed=seed, **{
            k: r[k] for k in ("hold_rate", "conv_rate", "init_rate")
        }, hold_runs=sorted(r["hold_runs"])[:4],
            conv_runs=sorted(r["conv_runs"])[-4:]))
        print(f"seed {seed}: hold {r['hold_rate']:.2f} "
              f"conv {r['conv_rate']:.2f} init {r['init_rate']:.2f} "
              f"worst-hold-runs {sorted(r['hold_runs'])[:4]}", flush=True)
    agg = {
        "hold_rate_mean": float(np.mean([r["hold_rate"] for r in rows])),
        "conv_rate_mean": float(np.mean([r["conv_rate"] for r in rows])),
        "init_rate_mean": float(np.mean([r["init_rate"] for r in rows])),
    }
    print(json.dumps(dict(src=args.src, per_seed=rows, **agg), indent=1))


if __name__ == "__main__":
    main()
