"""Profiling/roofline utility tests (CPU: API + math, not absolute perf)."""

import jax.numpy as jnp
import numpy as np

from eetq_tpu.utils.profiling import (
    RooflineReport,
    device_time,
    host_sync_overhead,
    roofline,
)


def test_roofline_memory_bound():
    # 1 GB moved in 2 ms -> 500 GB/s; trivial flops -> memory bound
    r = roofline(2e-3, 10**9, 10**6)
    assert r.bound == "memory"
    assert r.achieved_gbs == 500.0
    assert 0 < r.fraction_of_roof <= 1.0
    assert "GB/s" in str(r)


def test_roofline_compute_bound():
    # 10 TFLOP in 100 ms with tiny bytes -> compute bound
    r = roofline(0.1, 10**6, 10**13)
    assert r.bound == "compute"
    assert r.achieved_tflops == 100.0


def test_device_time_measures_something():
    x = jnp.ones((64, 64), jnp.float32)

    def f(c, x):
        return jnp.sum((x + c) @ x)

    t = device_time(f, x, iters=20, reps=2, sync_s=0.0)
    assert t > 0


def test_host_sync_overhead_positive():
    assert host_sync_overhead(reps=2) > 0
