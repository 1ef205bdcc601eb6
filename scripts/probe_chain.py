"""Probe: do back-to-back async dispatches pipeline through the axon relay?

Compares, for the same total compute (k matmul steps on a device-side
carry):
  (a) ONE jitted lax.scan of k steps  (single dispatch — the known-good)
  (b) k back-to-back calls of a jitted single step, carry staying on
      device, ONE host fetch at the end (the "decode chaining" pattern)

If (b) ~= (a) + small constant, dispatch delivery pipelines and the engine
can chain decode windows without paying ~26 ms per round.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = 4096
    w = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, n), jnp.bfloat16)

    @jax.jit
    def step(x):
        y = x @ w
        return y / (jnp.max(jnp.abs(y)) + 1.0)

    def make_scan(k):
        @jax.jit
        def f(x):
            def body(c, _):
                return step(c), None
            return jax.lax.scan(body, x, None, length=k)[0]
        return f

    def fetch(x):
        return np.asarray(x)

    # warm
    fetch(step(x0))
    t0 = time.perf_counter()
    fetch(step(x0))
    sync = time.perf_counter() - t0
    print(f"1-step dispatch+fetch: {sync*1e3:.1f} ms", flush=True)

    for k in (8, 32):
        scan = make_scan(k)
        fetch(scan(x0))  # compile
        t0 = time.perf_counter()
        fetch(scan(x0))
        t_scan = time.perf_counter() - t0
        # chained: k dispatches, one fetch
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x)
        fetch(x)
        t_chain = time.perf_counter() - t0
        print(f"k={k}: scan {t_scan*1e3:.1f} ms, chained {t_chain*1e3:.1f} ms "
              f"(delta {1e3*(t_chain-t_scan):.1f} ms, "
              f"{1e3*(t_chain-t_scan)/k:.2f} ms/dispatch)", flush=True)


if __name__ == "__main__":
    main()
