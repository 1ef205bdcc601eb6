"""Kernel-config selection: heuristic + per-shape cache (+ optional measured
autotune on real hardware).

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
"""

from __future__ import annotations

import dataclasses
import functools

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


@functools.lru_cache(maxsize=4096)
def choose_config(m: int, kp: int, np_: int) -> MatmulConfig:
    """Pick a block config for logical m and packed (padded) Kp, Np.

    Cached per shape (the fix for the reference's reselect-every-call,
    `fpA_intB_gemm_template.h:455-487`).
    """
    g = DEFAULT_LAYOUT.n_tile
    assert kp % DEFAULT_LAYOUT.k_tile == 0 and np_ % g == 0, (m, kp, np_)

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
    if best is None:
        return MatmulConfig(bm=128, bn=256, bk=256)
    return best[1]
