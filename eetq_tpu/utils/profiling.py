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


# ---- multi-chip scaling estimate (BASELINE "scaling efficiency" line) ----

# ICI link bandwidth per direction (public "How to Scale Your Model"
# numbers); a 1-D ring collective streams over one link each way.
ICI_BW_PER_LINK = {
    "TPU v4": 45e9,
    "TPU v5 lite": 45e9,
    "TPU v5e": 45e9,
    "TPU v5p": 90e9,
    "TPU v6 lite": 90e9,
    "TPU v6e": 90e9,
}
ICI_HOP_LATENCY_S = 1e-6  # per-hop launch/propagation floor


def count_collectives(fn: Callable, *args) -> dict[str, int]:
    """Count collective ops and their per-call payload bytes in `fn`'s
    jaxpr (recursing through pjit/scan/shard_map/closed_call bodies).

    Returns {primitive_name: total_bytes, primitive_name + "_count": n}.
    This makes the analytic scaling model below INSPECTABLE: a test can
    assert the model's "2 psums/layer + 1 lm_head all-gather" against the
    real sharded program."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out: dict[str, int] = {}

    def visit(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("psum", "psum2", "all_gather", "ppermute",
                        "reduce_scatter", "all_to_all", "psum_invariant"):
                nbytes = sum(
                    v.aval.size * v.aval.dtype.itemsize
                    for v in eqn.invars
                    if hasattr(v.aval, "size")
                )
                out[name] = out.get(name, 0) + nbytes
                out[f"{name}_count"] = out.get(f"{name}_count", 0) + 1
            for pval in eqn.params.values():
                for sub in jax.tree.leaves(
                    pval, is_leaf=lambda x: hasattr(x, "eqns")
                    or hasattr(x, "jaxpr")
                ):
                    if hasattr(sub, "jaxpr"):
                        visit(sub.jaxpr)
                    elif hasattr(sub, "eqns"):
                        visit(sub)

    visit(jaxpr.jaxpr)
    return out


@dataclasses.dataclass
class TPScalingEstimate:
    tp: int
    t_single_ms: float
    t_tp_ms: float
    t_hbm_ms: float
    t_ici_ms: float
    ici_bytes_per_step: int
    speedup: float
    efficiency: float  # speedup / tp: fraction of perfect linear scaling

    def __str__(self) -> str:
        return (
            f"tp={self.tp}: step {self.t_tp_ms:.2f} ms "
            f"(hbm {self.t_hbm_ms:.2f} + ici {self.t_ici_ms:.3f}; "
            f"{self.ici_bytes_per_step/1e6:.2f} MB over ICI) | "
            f"speedup {self.speedup:.2f}x, efficiency {self.efficiency:.0%}"
        )


def tp_decode_scaling(
    cfg,
    tp: int,
    batch: int = 1,
    seq: int = 1024,
    bits: int = 8,
    kv_bytes_per_elem: int = 2,
    measured_t1_ms: float | None = None,
) -> TPScalingEstimate:
    """Paper-napkin Megatron-TP decode-step scaling model from the roofline
    data (VERDICT r2 item 9 — the BASELINE >=85% multi-host line is not
    measurable on one chip, so publish the arithmetic instead).

    Per decode step at batch B, context S:
    - HBM per device: all four projections are column/row-split, so weight
      streaming divides by tp; KV is head-sharded, so it divides too.
    - ICI per device (1-D ring model, conservative — v5e has a 2-D torus):
      the row-parallel o_proj and down each psum a [B, 1, H] bf16
      activation (ring all-reduce traffic = 2*(tp-1)/tp * bytes), and the
      column-parallel lm_head all-gathers [B, 1, V] f32 logits
      ((tp-1)/tp * bytes). Latency: 2*(tp-1) hops per all-reduce.
    - t_tp = t_hbm + t_ici (serialized; XLA often overlaps some of it).

    measured_t1_ms anchors the single-chip step time to a REAL measurement
    (e.g. 10.2 ms for llama2-7b W8A16); otherwise the HBM roofline is used.
    """
    peak_gbs, _ = chip_peaks()
    kind = jax.devices()[0].device_kind
    ici_bw = next(
        (v for k, v in ICI_BW_PER_LINK.items() if kind.startswith(k)), 45e9
    )
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    wpb = 0.5 if bits == 4 else 1.0  # weight bytes per element
    layer_bytes = wpb * (
        h * cfg.qkv_out
        + cfg.num_heads * cfg.head_dim * h
        + h * 2 * inter
        + inter * h
    )
    head_bytes = wpb * h * v  # quantized lm_head (bench default)
    kv_bytes = (
        2 * batch * seq * cfg.num_kv_heads * cfg.head_dim * kv_bytes_per_elem
    )
    total_bytes = cfg.num_layers * layer_bytes + head_bytes + kv_bytes

    t1 = (
        measured_t1_ms / 1e3
        if measured_t1_ms is not None
        else total_bytes / (peak_gbs * 1e9)
    )
    # non-HBM overhead (dispatch, fusions) carried over from the measured
    # single-chip step — it does not shrink with tp
    overhead = max(0.0, t1 - total_bytes / (peak_gbs * 1e9))

    t_hbm = (total_bytes / tp) / (peak_gbs * 1e9)
    ar_bytes = 2 * (tp - 1) / tp * (batch * h * 2)  # one bf16 psum
    ag_bytes = (tp - 1) / tp * (batch * v * 4)  # f32 logits all-gather
    ici_bytes = int(2 * cfg.num_layers * ar_bytes + ag_bytes)
    n_collectives = 2 * cfg.num_layers + 1
    t_ici = ici_bytes / ici_bw + n_collectives * 2 * (tp - 1) * ICI_HOP_LATENCY_S
    t_tp = t_hbm + t_ici + overhead
    return TPScalingEstimate(
        tp=tp,
        t_single_ms=t1 * 1e3,
        t_tp_ms=t_tp * 1e3,
        t_hbm_ms=t_hbm * 1e3,
        t_ici_ms=t_ici * 1e3,
        ici_bytes_per_step=ici_bytes,
        speedup=t1 / t_tp,
        efficiency=t1 / t_tp / tp,
    )


@dataclasses.dataclass
class PPScalingEstimate:
    pp: int
    t_tick_ms: float  # steady-state ring tick (one microbatch-token)
    t_stage_ms: float  # per-stage compute share of the tick
    t_link_ms: float  # activation transfer + latency per boundary
    link_bytes_per_tick: int
    throughput_speedup: float  # aggregate tokens/s vs one device
    efficiency: float  # throughput_speedup / pp
    latency_x: float  # per-token latency multiplier vs one device

    def __str__(self) -> str:
        return (
            f"pp={self.pp}: tick {self.t_tick_ms:.2f} ms "
            f"(stage {self.t_stage_ms:.2f} + link {self.t_link_ms:.3f}; "
            f"{self.link_bytes_per_tick/1e3:.1f} KB/boundary) | "
            f"throughput {self.throughput_speedup:.2f}x, "
            f"efficiency {self.efficiency:.0%}, "
            f"token latency {self.latency_x:.2f}x"
        )


def pp_decode_scaling(
    cfg,
    pp: int,
    batch: int = 1,
    bits: int = 8,
    link_gbs: float = 12.5,
    link_latency_s: float = 25e-6,
    measured_t1_ms: float | None = None,
) -> PPScalingEstimate:
    """Token-ring pipeline-parallel decode throughput model
    (dist/pipeline.py's schedule with M = pp microbatches in flight).

    In the saturated ring every stage processes a different microbatch
    each tick, so the system retires ONE microbatch-token per tick:
      t_tick = t1/pp (each stage streams 1/pp of the weights)
               + t_link (one [B, H] bf16 activation + one hop latency).
    This is WEAK scaling: total live batch = pp microbatches of `batch`
    rows (one per stage). Throughput then scales like DP — but each
    device holds only 1/pp of the weights (DP replicates them pp times),
    which is what lets a too-big model serve at all. Per-token LATENCY
    is pp * t_tick (a microbatch traverses all stages): PP trades
    latency for memory/throughput, and its tiny per-boundary payload
    (vs TP's 2 psums/layer) makes it the right axis to put on DCN
    (defaults model a ~100 Gb/s, 25 us host link). At FIXED total batch
    PP gains nothing at decode (each stage streams 1/pp of the weights
    pp times as often) — use TP for that regime.

    measured_t1_ms: single-DEVICE step time for the whole model (or the
    tp-sharded per-step time when modeling pp-over-tp); default = HBM
    roofline of the full weight stream.
    """
    peak_gbs, _ = chip_peaks()
    h = cfg.hidden_size
    wpb = 0.5 if bits == 4 else 1.0
    layer_bytes = wpb * (
        h * cfg.qkv_out
        + cfg.num_heads * cfg.head_dim * h
        + h * 2 * cfg.intermediate_size
        + cfg.intermediate_size * h
    )
    total_bytes = cfg.num_layers * layer_bytes + wpb * h * cfg.vocab_size
    t1 = (
        measured_t1_ms / 1e3
        if measured_t1_ms is not None
        else total_bytes / (peak_gbs * 1e9)
    )
    # activation + ring token payload between stages, per tick
    link_bytes = int(batch * h * 2 + batch * 4)
    t_link = link_bytes / (link_gbs * 1e9) + link_latency_s
    t_stage = t1 / pp
    t_tick = t_stage + t_link
    speedup = t1 / t_tick  # tokens/s vs one device (batch per tick vs t1)
    return PPScalingEstimate(
        pp=pp,
        t_tick_ms=t_tick * 1e3,
        t_stage_ms=t_stage * 1e3,
        t_link_ms=t_link * 1e3,
        link_bytes_per_tick=link_bytes,
        throughput_speedup=speedup,
        efficiency=speedup / pp,
        latency_x=pp * t_tick / t1,
    )


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
