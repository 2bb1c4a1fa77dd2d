"""Empirical single-chip roofline for the MFU accounting in
doc/profile_r5.md (r4 VERDICT weak #2: "at ceiling" claims must be
checkable MFU statements).

Measures, on the attached TPU chip, achievable peaks for the four
resources the framework's hot paths consume:

  * mxu_bf16:  large square bf16 matmul (the PPO update's resource)
  * mxu_thin:  the PPO update's ACTUAL matmul shapes
               ([mb, K] @ [K, H] chains with K <= 512) — the thin-matmul
               ceiling the update sits at (doc/profile_r3.md)
  * vpu_f32:   a long fused element-wise fp32 chain (the physics
               kernel's resource: scalar-SoA algebra on (8, 128) tiles)
  * hbm:       device-to-device copy bandwidth

Prints one JSON object. Empirical peaks are preferred over data-sheet
numbers because the attached "v5 lite" chip is reached through the axon
tunnel and the public v5e sheet (197 bf16 TFLOP/s, 819 GB/s HBM) may not
describe it exactly; both are reported.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def mxu_bf16():
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    dt = _timeit(mm, a, b)
    return 2 * n ** 3 / dt / 1e12


def mxu_thin():
    """The PPO update's matmul chain at its real shapes: go2 minibatch
    24576 x [48 -> 512 -> 256 -> 128 -> 12] forward (bf16), summed over
    the chain — the K<=512 'thin' regime."""
    mb = 24576
    dims = [48, 512, 256, 128, 12]
    ws = [jnp.ones((dims[i], dims[i + 1]), jnp.bfloat16)
          for i in range(len(dims) - 1)]
    x = jnp.ones((mb, dims[0]), jnp.bfloat16)

    @jax.jit
    def chain(x, ws):
        for w in ws:
            x = x @ w
        return x

    dt = _timeit(chain, x, ws)
    flops = sum(2 * mb * dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    return flops / dt / 1e12


def vpu_f32():
    """Fused element-wise fp32 chain: 512 dependent FMAs on a
    VMEM-resident-per-tile array. XLA fuses this into one loop, so the
    measurement approaches the VPU's issue rate rather than HBM."""
    shape = (1024, 1024)
    x = jnp.ones(shape, jnp.float32)
    k = 512

    @jax.jit
    def chain(x):
        acc = x
        for _ in range(k):
            acc = acc * 1.000001 + 0.000001
        return acc

    dt = _timeit(chain, x)
    return 2 * k * np.prod(shape) / dt / 1e12


def hbm():
    n = 256 * 1024 * 1024 // 4  # 256 MB fp32
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def copy(x):
        return x + 1.0           # read + write

    dt = _timeit(copy, x)
    return 2 * n * 4 / dt / 1e9


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    out = {
        "device": str(jax.devices()[0]),
        "mxu_bf16_tflops": round(mxu_bf16(), 1),
        "mxu_thin_tflops": round(mxu_thin(), 1),
        "vpu_f32_tflops": round(vpu_f32(), 2),
        "hbm_gbps": round(hbm(), 1),
        "datasheet_v5e": {"bf16_tflops": 197, "hbm_gbps": 819},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
