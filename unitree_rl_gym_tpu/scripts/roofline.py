"""Empirical single-chip roofline for the MFU accounting in
doc/profile_r5.md (r4 VERDICT weak #2: "at ceiling" claims must be
checkable MFU statements).

Measures, on the attached TPU chip, achievable peaks for the four
resources the framework's hot paths consume:

  * mxu_bf16:  large square bf16 matmul (the PPO update's resource)
  * mxu_thin:  the PPO update's ACTUAL matmul shapes
               ([mb, K] @ [K, H] chains with K <= 512) — the thin-matmul
               ceiling the update sits at (doc/profile_r3.md)
  * vpu_f32:   a long fused element-wise fp32 FMA chain (the physics
               kernel's resource: scalar-SoA algebra on (8, 128) tiles)
  * hbm:       streaming read+write bandwidth

Measurement methodology (r5, after the first attempt produced
48 PFLOP/s nonsense): on the axon-tunneled chip
``jax.block_until_ready`` does NOT reliably await device completion and
every dispatch carries ~1.4 ms of RPC overhead, so each probe (a) loops
its op K times INSIDE one jitted program with a data dependence between
iterations (no dead-code elimination, one dispatch for K ops), (b)
forces completion with a 1-element ``np.asarray`` host fetch, and (c)
subtracts the measured empty-program dispatch+fetch overhead. Empirical
peaks are preferred over data-sheet numbers because the attached
"v5 lite" chip is reached through the tunnel and the public v5e sheet
(197 bf16 TFLOP/s, 819 GB/s HBM) may not describe it exactly; both are
reported.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=8, warmup=2):
    """Wall time per call; completion forced by a host fetch of one
    element of the output (block_until_ready lies on the axon backend)."""
    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.ravel()[0:1])

    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def dispatch_overhead():
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def ident(x):
        return x + 1.0

    return _timeit(ident, x, iters=16)


def mxu_bf16(oh):
    n, k = 8192, 4
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(key, (n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        def body(_, y):
            return y @ b

        return jax.lax.fori_loop(0, k, body, a)

    dt = max(_timeit(mm, a, b) - oh, 1e-9)
    return k * 2 * n ** 3 / dt / 1e12


def mxu_thin(oh):
    """The PPO update's matmul chain at its real shapes: go2 minibatch
    24576 x [48 -> 512 -> 256 -> 128 -> 12] forward (bf16), looped with
    a 12 -> 48 fold-back layer (0.3% extra flops, not counted) so
    iterations are data-dependent."""
    mb = 24576
    dims = [48, 512, 256, 128, 12]
    key = jax.random.PRNGKey(1)
    ws = [0.01 * jax.random.normal(key, (dims[i], dims[i + 1]), jnp.bfloat16)
          for i in range(len(dims) - 1)]
    w_back = 0.01 * jax.random.normal(key, (dims[-1], dims[0]), jnp.bfloat16)
    x = jax.random.normal(key, (mb, dims[0]), jnp.bfloat16)
    k = 32

    @jax.jit
    def chain(x, ws, w_back):
        def body(_, x):
            y = x
            for w in ws:
                y = y @ w
            return y @ w_back

        return jax.lax.fori_loop(0, k, body, x)

    dt = max(_timeit(chain, x, ws, w_back) - oh, 1e-9)
    flops = k * sum(
        2 * mb * dims[i] * dims[i + 1] for i in range(len(dims) - 1)
    )
    return flops / dt / 1e12


def vpu_f32(oh):
    """Fused element-wise fp32 FMA chain on a 16 MB array: 2048
    dependent FMAs per element in one program."""
    shape = (2048, 2048)
    x = jnp.ones(shape, jnp.float32)
    outer, inner = 256, 8

    @jax.jit
    def chain(x):
        def body(_, acc):
            for _i in range(inner):
                acc = acc * 1.000001 + 1e-6
            return acc

        return jax.lax.fori_loop(0, outer, body, x)

    dt = max(_timeit(chain, x) - oh, 1e-9)
    return 2 * outer * inner * np.prod(shape) / dt / 1e12


def hbm(oh):
    n = 256 * 1024 * 1024 // 4  # 256 MB fp32
    x = jnp.ones((n,), jnp.float32)
    k = 16

    @jax.jit
    def stream(x):
        def body(_, y):
            return y + 1.0       # read + write, too big to stay in VMEM

        return jax.lax.fori_loop(0, k, body, x)

    dt = max(_timeit(stream, x) - oh, 1e-9)
    return k * 2 * n * 4 / dt / 1e9


def main():
    from unitree_rl_gym_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    oh = dispatch_overhead()
    out = {
        "device": str(jax.devices()[0]),
        "dispatch_overhead_ms": round(oh * 1e3, 2),
        "mxu_bf16_tflops": round(mxu_bf16(oh), 1),
        "mxu_thin_tflops": round(mxu_thin(oh), 1),
        "vpu_f32_tflops": round(vpu_f32(oh), 2),
        "hbm_gbps": round(hbm(oh), 1),
        "datasheet_v5e": {"bf16_tflops": 197, "hbm_gbps": 819},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
