"""Kernel-config selection: heuristic + per-shape cache + measured autotune
with a persistent per-chip cache.

The reference enumerates CUTLASS tile configs and scores them with an
SM-occupancy wave-quantization model on EVERY GEMM call
(`csrc/cutlass_kernels/cutlass_heuristic.cc:105-206`,
`fpA_intB_gemm_template.h:439-490` — uncached, a known wart). Here the
selection is cached per logical shape, and jit caching makes the compiled
kernel itself persistent.

TPU differences that shape the heuristic: a TensorCore executes the Pallas
grid sequentially with pipelined DMA (no SM occupancy / wave quantization),
so the goals are (1) blocks big enough that HBM DMA streams at full
bandwidth and the MXU stays fed, (2) double-buffered working set within
VMEM (~16 MiB higher bound, budgeted lower), (3) for the decode regime
(m <= MAX_DECODE_M) minimize per-block overhead: whole-K blocks so there is
no accumulator carry and the int8 weight is read exactly once.

The built-in constants are MEASURED ON v5e; other generations (v4/v5p/v6e)
fall back to the same rules (block sizes scale with VMEM, which is 16 MiB
on all of them — reasonable, not validated). For exact tuning anywhere, the
measured autotuner (`measured_autotune` / `autotune_shapes`, or
`EETQ_AUTOTUNE=1` to tune on first use) sweeps real candidate configs with
`utils.profiling.device_time` and persists winners per device kind in a
JSON cache (`EETQ_AUTOTUNE_CACHE`, default ~/.cache/eetq_tpu/autotune.json)
consulted before the heuristic — the reference's measured-occupancy idea
(`cutlass_heuristic.cc:123-206`) done once and cached instead of per call.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os

from eetq_tpu.layout import DEFAULT_LAYOUT

# Decode regime threshold. The reference uses m <= 4
# (`fpA_intB_gemm_wrapper.h:4` SMALL_M_FAST_PATH); on TPU the fp32 sublane is
# 8, so every m <= 8 costs the same — widen the fast path to 8.
MAX_DECODE_M = 8

VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # leave headroom under the 16 MiB/core


@dataclasses.dataclass(frozen=True)
class MatmulConfig:
    """Block shape for the w8a16 matmul kernel. All multiples of the layout
    granule so blocks exactly divide the packed (padded) weight dims."""

    bm: int
    bn: int
    bk: int

    def vmem_bytes(self, x_bytes: int = 2, out_bytes: int = 2) -> int:
        # x block + int8 w block (double-buffered) + f32 acc + out block.
        return 2 * (self.bm * self.bk * x_bytes + self.bk * self.bn) + (
            self.bm * self.bn * 4 + 2 * self.bm * self.bn * out_bytes
        )


def _divisors_from(candidates: tuple[int, ...], dim: int) -> list[int]:
    return [c for c in candidates if dim % c == 0]


def _cache_path() -> str:
    return os.environ.get(
        "EETQ_AUTOTUNE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "eetq_tpu", "autotune.json"
        ),
    )


@functools.lru_cache(maxsize=1)
def _load_persistent() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_persistent(cache: dict) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _load_persistent.cache_clear()


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def _m_bucket(m: int) -> int:
    """Shapes are cached per m-bucket: decode ms share one compiled config
    (the f32 sublane makes m<=8 identical); larger ms bucket to powers of
    two, like jit's own padding behavior for the block grid."""
    if m <= MAX_DECODE_M:
        return MAX_DECODE_M
    return 1 << (m - 1).bit_length()


def _tune_key(m: int, kp: int, np_: int, bits: int) -> str:
    return f"{_device_kind()}|b{bits}|m{_m_bucket(m)}|k{kp}|n{np_}"


@functools.lru_cache(maxsize=4096)
def choose_config(m: int, kp: int, np_: int, bits: int = 8) -> MatmulConfig:
    """Pick a block config for logical m and packed (padded) Kp, Np.

    Lookup order: persistent measured-autotune cache (per device kind),
    then the v5e-measured heuristic below. Cached per shape (the fix for
    the reference's reselect-every-call, `fpA_intB_gemm_template.h:455-487`).
    Set EETQ_AUTOTUNE=1 to measure-and-persist on first use of each shape
    (real TPU only; adds seconds per new shape)."""
    g = DEFAULT_LAYOUT.n_tile
    assert kp % DEFAULT_LAYOUT.k_tile == 0 and np_ % g == 0, (m, kp, np_)

    tuned = _load_persistent().get(_tune_key(m, kp, np_, bits))
    if tuned is not None:
        return MatmulConfig(bm=tuned[0], bn=tuned[1], bk=tuned[2])
    if os.environ.get("EETQ_AUTOTUNE") == "1":
        try:
            import jax

            if jax.default_backend() == "tpu":
                return measured_autotune(m, kp, np_, bits=bits)
        except Exception:
            pass  # fall through to the heuristic
    return _heuristic_config(m, kp, np_, bits)


def _heuristic_config(m: int, kp: int, np_: int, bits: int = 8) -> MatmulConfig:
    """The pure v5e-measured heuristic — no cache lookup, no measured-autotune
    re-entry (so `_candidate_configs`' fallback can call it without the
    EETQ_AUTOTUNE=1 path recursing back into `measured_autotune`)."""
    if m <= MAX_DECODE_M:
        # Decode GEMV regime: weight-bandwidth-bound. Measured on v5e
        # (scripts/microbench_gemv.py, llama2-7b decode shapes): ~1 MiB int8
        # weight blocks with a tall-K aspect stream at 750-900 GB/s
        # (~peak), while whole-K bn=512 blocks drop as low as 434 GB/s.
        # Rule: bm=8 (the f32 sublane tile; measured ~1 tok/s better than
        # bm=m unpadded blocks on the llama2-7b e2e bench), bn=256 (two
        # lane tiles), bk = largest divisor of Kp with bk*bn <= ~1.5 MiB.
        bm = 8
        bn = 256
        kt = DEFAULT_LAYOUT.k_tile
        divisors = [d for d in range(kt, kp + 1, kt) if kp % d == 0]
        if bits == 4 and np_ % 512 == 0:
            # int4 is VPU-(unpack-)bound, not DMA-bound: BIGGER blocks win
            # decisively (vmap-probe + e2e r2: bn=512 deep-bk 644-678 GB/s
            # vs bn=256's 502-610; llama2-7b W4A16 e2e 123 -> 143 tok/s).
            fitting = [
                d for d in divisors
                if MatmulConfig(bm, 512, d).vmem_bytes() <= VMEM_BUDGET_BYTES
            ]
            if fitting:
                return MatmulConfig(bm=bm, bn=512, bk=fitting[-1])
        # Largest divisor in the sweet band [2048, 6144] (bk=4096 measured
        # 755-839 GB/s vs 632-707 at bk=2048); else the smallest divisor
        # above it that fits VMEM (a big block still streams near peak —
        # e.g. whole-K 11008x256 = 2.8 MiB measured 766 GB/s — while tiny
        # bk thrashes the pipeline).
        in_band = [d for d in divisors if 2048 <= d <= 6144]
        if in_band:
            return MatmulConfig(bm=bm, bn=bn, bk=in_band[-1])
        above = [
            d
            for d in divisors
            if d > 6144
            and MatmulConfig(bm, bn, d).vmem_bytes() <= VMEM_BUDGET_BYTES
        ]
        if above:
            return MatmulConfig(bm=bm, bn=bn, bk=above[0])
        return MatmulConfig(bm=bm, bn=bn, bk=divisors[-1] if divisors else kt)

    # Prefill GEMM regime: MXU-bound. v5e-measured (llama2-7b shapes at
    # M=1024): bm=256 beats bm=512 (smaller output tile -> better pipeline
    # overlap), bn=512, and the deepest K block wins (bk=2048: qkv 167 vs
    # 143 TF/s at the old 512x512x1024 choice).
    best = None
    for bm in (256, 128):
        if bm > max(128, 2 * m):
            continue  # don't waste compute on padding rows
        for bn in (512, 256):
            if np_ % bn != 0:
                continue
            for bk in (2048, 1024, 512, 256):
                if kp % bk != 0:
                    continue
                cfg = MatmulConfig(bm, bn, bk)
                if cfg.vmem_bytes() > VMEM_BUDGET_BYTES:
                    continue
                score = (bm * bn, bk)  # prefer big output tiles, then deep K
                if best is None or score > best[0]:
                    best = (score, cfg)
    if best is not None and best[1].bk < 1024 and bits == 8:
        # Kp has no deep power-of-two divisor (llama down 11008 = 2^8*43,
        # 13824 = 2^9*27): the fixed candidate list collapses to a shallow
        # bk and the k-loop dominates — down proj measured 103-116 TF/s at
        # (256, 512, 256). A deep odd-factor divisor paired with bm=128
        # (VMEM headroom) restores pipeline depth: (128, 512, 5504)
        # measured 134-144 TF/s on the same GEMM, interleaved reps
        # (scripts/r5_results.jsonl "down_bk"). bk needs only 128-lane
        # alignment (the packed layout is row-major padded, k_tile is a
        # padding granule, not an interleave); int4's halved K rows keep
        # the proven power-of-two blocks.
        deep = [
            d for d in range(128, min(kp, 8192) + 1, 128)
            if kp % d == 0 and d > best[1].bk
        ]
        for bn in (512, 256):
            if np_ % bn:
                continue
            for d in reversed(deep):
                cfg = MatmulConfig(128, bn, d)
                if cfg.vmem_bytes() <= VMEM_BUDGET_BYTES:
                    return cfg
    if best is None:
        return MatmulConfig(bm=128, bn=256, bk=256)
    return best[1]


# ---- measured autotune (persistent per-chip cache) ----


def _candidate_configs(m: int, kp: int, np_: int, bits: int = 8) -> list[MatmulConfig]:
    """Candidate blocks for a measured sweep — a superset of what the
    heuristic would pick, bounded so the sweep stays a handful of compiles."""
    kt = DEFAULT_LAYOUT.k_tile
    k_divs = [d for d in range(kt, kp + 1, kt) if kp % d == 0] or [kp]
    out: list[MatmulConfig] = []
    if m <= MAX_DECODE_M:
        bks = sorted(
            {
                max((d for d in k_divs if d <= t), default=k_divs[0])
                for t in (1024, 2048, 4096, 6144, kp)
            }
        )
        for bn in (128, 256, 512):
            if np_ % bn:
                continue
            for bk in bks:
                cfg = MatmulConfig(bm=8, bn=bn, bk=bk)
                if cfg.vmem_bytes() <= VMEM_BUDGET_BYTES:
                    out.append(cfg)
    else:
        for bm in (128, 256, 512):
            if bm > max(128, 2 * m):
                continue
            for bn in (256, 512):
                if np_ % bn:
                    continue
                for bk in (512, 1024, 2048):
                    if kp % bk:
                        continue
                    cfg = MatmulConfig(bm, bn, bk)
                    if cfg.vmem_bytes() <= VMEM_BUDGET_BYTES:
                        out.append(cfg)
    return out or [_heuristic_config(m, kp, np_, bits)]


def measured_autotune(
    m: int,
    kp: int,
    np_: int,
    bits: int = 8,
    iters: int = 50,
    save: bool = True,
    verbose: bool = False,
) -> MatmulConfig:
    """Sweep candidate block configs ON HARDWARE with
    `utils.profiling.device_time` (relay-proof fori_loop timing) and persist
    the winner in the per-chip JSON cache. Returns the fastest config.

    The reference re-derives its config from an occupancy model on every
    call (`cutlass_heuristic.cc:123-206`); this measures once and caches.
    """
    import jax
    import jax.numpy as jnp

    from eetq_tpu.layout import pack_weights
    from eetq_tpu.quant import symmetric_quantize
    from eetq_tpu.utils.profiling import device_time, host_sync_overhead

    klog = kp * (2 if bits == 4 else 1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, klog), jnp.bfloat16)
    # XLA VMEM-stages LOOP-INVARIANT weights inside fori_loop microbenches
    # (measured: a 16 MB weight "streams" at 19 TB/s — it's resident). The
    # probe therefore VMAPS the kernel over a STACK of distinct weights big
    # enough to exceed VMEM — the batched kernel reads each slice IN PLACE
    # from HBM (measured 733 GB/s at the 7B qkv shape, matching e2e decode).
    # Rejected alternatives: a chain of separate weight arrays sends XLA's
    # memory-space assignment pathological (round-1 scan-over-layers failure
    # mode), and lax.scan over the stack materializes a copy of every slice
    # before the kernel (~430 GB/s apparent — copy-bound, not kernel-bound).
    w_bytes = klog * np_ // (2 if bits == 4 else 1)
    n_weights = int(max(2, -(-48 * 1024 * 1024 // w_bytes)))
    qd_list, sc_list = [], []
    for i in range(n_weights):
        w = jax.random.normal(
            jax.random.PRNGKey(i), (klog, np_), jnp.float32
        ) * klog**-0.5
        q, s = symmetric_quantize(w, bits=bits)
        pw = pack_weights(q, bits=bits)
        qd_list.append(pw.data)
        sc_list.append(s)
        del w, q, s
    proto = pw
    qdatas = jnp.stack(qd_list)
    scs = jnp.stack(sc_list)
    del qd_list, sc_list

    from eetq_tpu.ops.linear import w8a16_matmul

    sync = host_sync_overhead()
    best: tuple[float, MatmulConfig] | None = None
    for cfg in _candidate_configs(m, kp, np_, bits):
        def f(c, x, cfg=cfg):
            def one(qd, sc):
                return w8a16_matmul(
                    x + c,
                    dataclasses.replace(proto, data=qd),
                    sc,
                    config=cfg,
                )[0, 0].astype(jnp.float32)

            return jnp.sum(jax.vmap(one)(qdatas, scs))

        try:
            # total matmuls per rep must dwarf the relay floor (~26 ms) or
            # the subtraction leaves pure noise: target >= ~4000 matmuls
            loop_iters = max(iters, 4000 // n_weights)
            t = device_time(f, x, iters=loop_iters, sync_s=sync)
            t = t / n_weights
        except Exception as e:  # invalid config for this shape: skip
            if verbose:
                print(f"  {cfg}: failed ({type(e).__name__})")
            continue
        if verbose:
            gbs = w_bytes / t / 1e9
            print(f"  {cfg}: {t*1e6:.1f} us ({gbs:.0f} GB/s weight-stream)")
        if best is None or t < best[0]:
            best = (t, cfg)
    if best is None:
        return _heuristic_config(m, kp, np_, bits)
    if save:
        cache = dict(_load_persistent())
        cache[_tune_key(m, kp, np_, bits)] = [
            best[1].bm, best[1].bn, best[1].bk
        ]
        _save_persistent(cache)
        choose_config.cache_clear()
    return best[1]


def autotune_shapes(
    shapes: list[tuple[int, int, int]] | None = None,
    cfg=None,
    bits: int = 8,
    batch: int = 1,
    verbose: bool = True,
) -> dict:
    """Pre-tune a list of (m, k_logical, n) shapes — or every projection of a
    ModelConfig at decode (m=batch) and prefill — persisting the winners.
    Returns {key: [bm, bn, bk]} of everything tuned."""
    from eetq_tpu.layout import DEFAULT_LAYOUT as L

    if shapes is None:
        if cfg is None:
            raise ValueError("pass shapes or a ModelConfig")
        h, i = cfg.hidden_size, cfg.intermediate_size
        proj = [
            (h, cfg.qkv_out),
            (cfg.num_heads * cfg.head_dim, h),
            (h, 2 * i),
            (i, h),
        ]
        shapes = [(batch, k, n) for k, n in proj]
        shapes += [(1024, k, n) for k, n in proj]
    tuned = {}
    for m, k, n in shapes:
        # padded PACKED data rows, matching layout.pack_weights: int4 pads
        # K to 2*k_tile granules (split-half) then stores K/2 rows
        if bits == 4:
            kp = (-(-k // (2 * L.k_tile)) * 2 * L.k_tile) // 2
        else:
            kp = -(-k // L.k_tile) * L.k_tile
        np_ = -(-n // L.n_tile) * L.n_tile
        if verbose:
            print(f"tuning m={m} k={k} n={n} (bits={bits})...")
        best = measured_autotune(m, kp, np_, bits=bits, verbose=verbose)
        tuned[_tune_key(m, kp, np_, bits)] = [best.bm, best.bn, best.bk]
        if verbose:
            print(f"  -> {best}")
    return tuned
