"""Profile a full train iteration on the current backend and print a
per-op time summary.

    python -m unitree_rl_gym_tpu.scripts.profile_train --task=go2 \
        [--num_envs=4096] [--iters=2] [--out=/tmp/prof]

Wraps ``jax.profiler.trace`` around ``PPO.train_iteration`` (the same
program bench.py measures) and aggregates XLA op durations straight from
the ``*.xplane.pb`` protobuf — the tensorboard profile plugin's converter
is broken on this box (TF version skew), parsing the xplane directly with
``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` works.

The r3 profile summaries produced by this tool live in doc/profile_r3.md
(the evidence for the windowed-terrain and permute-once-PPO rewrites).
"""

import argparse
import collections
import glob
import os
import shutil
import sys
import time


def build(task, num_envs):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))
    import bench

    return bench.build(task, num_envs)


def aggregate_xplane(path, top=25):
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {path}"
    agg = collections.Counter()
    total = 0
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    agg[emeta.get(ev.metadata_id, "?")] += ev.duration_ps
                    total += ev.duration_ps
    rows = [
        (ps / 1e9, 100.0 * ps / max(total, 1), name[:110])
        for name, ps in agg.most_common(top)
    ]
    return total / 1e9, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="go2")
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    out = args.out or f"/tmp/prof_{args.task}"
    if os.path.isdir(out):
        shutil.rmtree(out)

    train_step, carry, spi = build(args.task, args.num_envs)
    o = train_step(*carry)
    jax.block_until_ready(o)
    carry = o[:-1]
    t0 = time.time()
    for _ in range(3):
        o = train_step(*carry)
        carry = o[:-1]
    jax.block_until_ready(o[2])
    ms = (time.time() - t0) / 3 * 1e3
    print(f"[profile] {args.task}: {ms:.2f} ms/iter "
          f"({spi / ms * 1000:.0f} env-steps/s)")

    with jax.profiler.trace(out):
        for _ in range(args.iters):
            o = train_step(*carry)
            carry = o[:-1]
        jax.block_until_ready(o[2])

    total_ms, rows = aggregate_xplane(out)
    print(f"[profile] total XLA-op time over {args.iters} iters: "
          f"{total_ms:.1f} ms")
    for dur, pct, name in rows:
        print(f"{dur:9.2f} ms {pct:5.1f}%  {name}")


if __name__ == "__main__":
    main()
