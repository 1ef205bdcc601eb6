"""Benchmarking + roofline accounting utilities.

The reference has no built-in profiling (SURVEY.md §5: examples use
`torch.cuda.synchronize()` + wall timing). On TPU — especially behind a
remote relay where per-dispatch latency is tens of milliseconds and
`block_until_ready` does not actually synchronize — wall-timing individual
calls is meaningless. The correct pattern, packaged here:

- `device_time(fn, *args)`: run fn ITERS times inside ONE jitted
  lax.fori_loop with a forced data dependency between iterations (single
  dispatch), fetch a scalar to the host (the only real sync), subtract the
  measured host-sync floor, divide by ITERS.
- `roofline(...)`: compare achieved bytes/s and flops/s against the chip's
  peaks and report which wall the kernel is against.
- `trace(...)`: jax.profiler wrapper for capturing device traces when the
  backend supports it.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Peak numbers per chip generation (HBM GB/s, bf16 TFLOP/s).
CHIP_PEAKS = {
    "TPU v4": (1228.0, 275.0),
    "TPU v5 lite": (819.0, 197.0),
    "TPU v5e": (819.0, 197.0),
    "TPU v5p": (2765.0, 459.0),
    "TPU v6 lite": (1640.0, 918.0),
    "TPU v6e": (1640.0, 918.0),
}


def chip_peaks() -> tuple[float, float]:
    """(HBM GB/s, bf16 TFLOP/s) for device 0, or conservative defaults."""
    kind = jax.devices()[0].device_kind
    for name, peaks in CHIP_PEAKS.items():
        if kind.startswith(name):
            return peaks
    return (819.0, 197.0)


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def host_sync_overhead(reps: int = 5) -> float:
    """Measured round-trip of a trivial dispatch+fetch (the relay floor)."""
    f = jax.jit(lambda x: x + 1)
    xs = jnp.ones((8,), jnp.float32)
    _fetch(f(xs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(f(xs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_time(
    fn: Callable,
    *args,
    iters: int = 200,
    reps: int = 3,
    sync_s: float | None = None,
) -> float:
    """Seconds per call of `fn(carry, *args) -> scalar-convertible`.

    fn receives a f32 scalar carry it must fold into its inputs (data
    dependency that serializes iterations); it must return something whose
    mean/first element depends on the computation.
    """
    if sync_s is None:
        sync_s = host_sync_overhead()

    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(c * 1e-30, *a)
            return jnp.asarray(out, jnp.float32).ravel()[0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _fetch(loop(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(loop(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - sync_s, 1e-12) / iters


@dataclasses.dataclass
class RooflineReport:
    seconds: float
    bytes_moved: int
    flops: int
    achieved_gbs: float
    achieved_tflops: float
    peak_gbs: float
    peak_tflops: float
    bound: str  # "memory" | "compute"
    fraction_of_roof: float

    def __str__(self) -> str:
        return (
            f"{self.seconds*1e6:.1f} us | {self.achieved_gbs:.0f}/{self.peak_gbs:.0f} "
            f"GB/s | {self.achieved_tflops:.1f}/{self.peak_tflops:.0f} TFLOP/s | "
            f"{self.bound}-bound, {self.fraction_of_roof:.0%} of roof"
        )


def roofline(seconds: float, bytes_moved: int, flops: int) -> RooflineReport:
    """Score a measured kernel time against the chip's roofline."""
    peak_gbs, peak_tflops = chip_peaks()
    achieved_gbs = bytes_moved / seconds / 1e9
    achieved_tflops = flops / seconds / 1e12
    t_mem = bytes_moved / (peak_gbs * 1e9)
    t_flop = flops / (peak_tflops * 1e12)
    bound = "memory" if t_mem >= t_flop else "compute"
    roof_t = max(t_mem, t_flop)
    return RooflineReport(
        seconds=seconds,
        bytes_moved=bytes_moved,
        flops=flops,
        achieved_gbs=achieved_gbs,
        achieved_tflops=achieved_tflops,
        peak_gbs=peak_gbs,
        peak_tflops=peak_tflops,
        bound=bound,
        fraction_of_roof=roof_t / seconds,
    )


def profile_w8a16_matmul(
    m: int, k: int, n: int, bits: int = 8, iters: int = 200
) -> RooflineReport:
    """Measure the quantized matmul at (m, k, n) and roofline it."""
    from eetq_tpu.layout import pack_weights
    from eetq_tpu.ops import w8a16_matmul
    from eetq_tpu.quant import symmetric_quantize

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.float32) * k**-0.5
    q, s = symmetric_quantize(w, bits=bits)
    pw = pack_weights(q, bits=bits)

    def f(c, x):
        return w8a16_matmul(x + c, pw, s)[0, 0]

    t = device_time(f, x, iters=iters)
    w_bytes = k * n // (2 if bits == 4 else 1)
    bytes_moved = m * k * 2 + w_bytes + m * n * 2 + n * 4
    return roofline(t, bytes_moved, 2 * m * k * n)


def trace(path: str):
    """Context manager: capture a jax.profiler device trace to `path`
    (viewable in TensorBoard / xprof). May be unsupported on relayed
    backends — falls back to a no-op with a warning."""
    import contextlib

    from eetq_tpu.utils.logging import get_logger

    log = get_logger(__name__)

    @contextlib.contextmanager
    def cm():
        try:
            jax.profiler.start_trace(path)
            started = True
        except Exception as e:  # relay backends may not support profiling
            log.warning("jax.profiler unavailable (%s); trace skipped", e)
            started = False
        try:
            yield
        finally:
            if started:
                jax.profiler.stop_trace()

    return cm()
