"""Microbenchmark the W8A16 decode GEMV kernel at llama decode shapes.

The TPU sits behind a relay with ~30ms per-dispatch latency, so each config
is measured as ONE jitted program that runs the kernel `ITERS` times in a
lax.fori_loop with a data dependency between iterations (sequential device
execution, one dispatch). Reports achieved HBM bandwidth (weight bytes /
time) per config.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.kernels.autotune import MatmulConfig
from eetq_tpu.kernels.w8a16 import Epilogue, w8a16_matmul_kernel_call

# llama2-7b decode shapes: qkv, o, gateup, down (K, N)
SHAPES = [
    (4096, 12288, "qkv"),
    (4096, 4096, "o_proj"),
    (4096, 22016, "gateup"),
    (11264, 4096, "down(pad)"),  # 11008 padded to layout granule
]

ITERS = 300


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


@functools.partial(jax.jit, static_argnames=("cfg", "k", "n"))
def _loop(x0, w, s, cfg, k, n):
    ep = Epilogue()

    def body(i, carry):
        x, acc = carry
        out = w8a16_matmul_kernel_call(x, w, s, None, None, cfg, ep, False)
        # data dependency: next x depends on this out (prevents overlap/DCE)
        x = x0 + out[0, 0] * 1e-30
        return x, acc + out[0, 0]

    _, acc = jax.lax.fori_loop(0, ITERS, body, (x0, jnp.float32(0.0)))
    return acc


def bench_config(k, n, cfg: MatmulConfig, sync_s: float) -> float:
    x = jnp.ones((cfg.bm, k), jnp.bfloat16)
    w = jnp.ones((k, n), jnp.int8)
    s = jnp.ones((n,), jnp.float32)
    _fetch(_loop(x, w, s, cfg, k, n))  # compile + warm
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        _fetch(_loop(x, w, s, cfg, k, n))
        times.append(time.perf_counter() - t0 - sync_s)
    return max(min(times), 1e-9) / ITERS


def measure_sync() -> float:
    f = jax.jit(lambda x: x + 1)
    xs = jnp.ones((8,), jnp.float32)
    _fetch(f(xs))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch(f(xs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sync_s = measure_sync()
    print(f"sync overhead {sync_s*1e3:.1f}ms", file=sys.stderr)

    for k, n, name in SHAPES:
        print(f"\n== {name}: K={k} N={n}  weight={k*n/1e6:.1f} MB ==", flush=True)
        results = []
        for bm in (8, 16, 32):
            for bn in (256, 512, 1024, 2048):
                if n % bn:
                    continue
                for bk in (k, k // 2, k // 4):
                    if k % bk or bk % 256:
                        continue
                    cfg = MatmulConfig(bm=bm, bn=bn, bk=bk)
                    if cfg.vmem_bytes() > 14 * 1024 * 1024:
                        continue
                    try:
                        t = bench_config(k, n, cfg, sync_s)
                    except Exception as e:
                        print(f"  {cfg} FAILED: {str(e)[:90]}")
                        continue
                    gbs = k * n / t / 1e9
                    results.append((gbs, cfg, t))
                    print(f"  bm={bm:3d} bn={bn:5d} bk={bk:6d}: "
                          f"{t*1e6:8.1f} us  {gbs:6.1f} GB/s", flush=True)
        results.sort(reverse=True, key=lambda r: r[0])
        best = results[0]
        print(f"  BEST: {best[1]} -> {best[0]:.1f} GB/s ({best[2]*1e6:.1f} us)")


if __name__ == "__main__":
    main()
