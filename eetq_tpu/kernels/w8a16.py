"""Fused dequant + matmul Pallas kernels: the W8A16 / W4A16 hot path.

One kernel template serves both regimes the reference implements as two
separate CUDA code bases (~4k LoC):

- prefill / large-batch tiled GEMM — the CUTLASS fpA_intB path
  (`csrc/cutlass_kernels/fpA_intB_gemm/fpA_intB_gemm_template.h`), and
- decode batched GEMV for m <= MAX_DECODE_M — the TRT-LLM path
  (`csrc/weightOnlyBatchedGemv/kernel.h`).

On TPU the two regimes differ only in block configuration (chosen by
`eetq_tpu.kernels.autotune`): the decode config streams ~1 MiB tall-K int8
blocks at full HBM bandwidth, the prefill config uses large square output
tiles that keep the MXU fed. Pallas' grid pipeline replaces the hand-written
cp.async multistage pipelining (`dq_mma_multistage.h`); the MXU consumes
bf16 directly, so "dequant" is an in-register int->bf16 convert with the
per-channel scale applied ONCE to the f32 accumulator at the last K step
(scales commute with the K-sum — the invariant the reference maintains with
its warp-level dequantizer, `mma_tensorop_dequantizer.h:152-183`, hoisted
out of the inner loop).

Quantization granularities (the reference GEMV's PerChannel vs
GroupWise(64/128), `weightOnlyBatchedGemv/common.h:62-105`):
- per-channel: scales [N], applied once to the final accumulator (exact);
- group-wise: scales [G, N] with group size g = K/G along K. When
  bk % g == 0 the kernel runs an unrolled subgroup loop applying each
  group's scale to that subgroup's f32 partial dot (exact); when
  g % bk == 0 the scale row is constant per block.

Weight dtypes (the reference's Int8b/Int4b kernels):
- int8: packed [Kp, Np];
- int4: split-half nibble packing [Kp/2, Np] — element (i, n) holds
  q[i, n] in the low nibble and q[i + Kp/2, n] in the high nibble. The
  kernel fetches TWO x blocks per k-step (k and k + nk) and issues two
  MXU dots; sign-extension is two arithmetic shifts. This avoids any
  in-kernel row interleave (the TPU analogue of why the reference packs
  offline for its ldmatrix layout, `cutlass_preprocessors.cc:337-358`).

Epilogue fusion (bias, relu/gelu/silu, residual add/mul) mirrors
`gemm_bias_act` / `gemm_bias_act_residual`
(`fpA_intB_gemm_template.h:492-537,804-843`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eetq_tpu.kernels.autotune import MatmulConfig

_ACTIVATIONS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "gelu": jax.nn.gelu,  # tanh approx, like ft_fused_activations.h:40-60
    "silu": jax.nn.silu,
}


@dataclasses.dataclass(frozen=True)
class Epilogue:
    """Static description of the fused epilogue (hashable for jit)."""

    has_bias: bool = False
    activation: str | None = None  # None | relu | gelu | silu
    residual: str | None = None  # None | add | mul

    def __post_init__(self):
        if self.activation not in _ACTIVATIONS:
            raise ValueError(f"unknown activation {self.activation!r}")
        if self.residual not in (None, "add", "mul"):
            raise ValueError(f"unknown residual mode {self.residual!r}")


def _dot_scaled(x_blk, w_blk, s_ref, g: int | None, row_base, acc_ref, dtype,
                bias_correction: float = 0.0):
    """acc += x @ dequant(w) for one (possibly int4-half) weight block.

    x_blk [bm, bk], w_blk int8 [bk, bn] (already sign-extended values).
    s_ref is None (per-channel, scale applied once in the epilogue) or a
    VMEM ref holding ALL group-scale rows for this column block ([Gp, bn]);
    row_base is the (traced) scale row of this block's first K element.
    Group scales are ALWAYS applied in-loop to the f32 partial dot — exact,
    and correct across blocks with different scale rows.

    bias_correction = c != 0 means w_blk holds w + c (uniformly biased
    values, e.g. int4 low nibbles kept at lo+8): the dot identity
    x @ (w + c) - c * rowsum(x) recovers x @ w with one [bm, 1] reduction
    instead of debiasing the whole [bk, bn] weight block.
    """
    w = w_blk.astype(dtype)
    if s_ref is None:
        acc_ref[:] += jnp.dot(x_blk, w, preferred_element_type=jnp.float32)
        if bias_correction:
            acc_ref[:] -= bias_correction * jnp.sum(
                x_blk.astype(jnp.float32), axis=-1, keepdims=True
            )
        return
    bk = w_blk.shape[0]
    if g >= bk:
        # group spans >= 1 whole blocks: one scale row for the block
        part = jnp.dot(x_blk, w, preferred_element_type=jnp.float32)
        if bias_correction:
            part -= bias_correction * jnp.sum(
                x_blk.astype(jnp.float32), axis=-1, keepdims=True
            )
        s_row = s_ref[pl.ds(row_base, 1), :]
        acc_ref[:] += part * s_row.astype(jnp.float32)
        return
    for t in range(bk // g):
        xg = x_blk[:, t * g : (t + 1) * g]
        part = jnp.dot(
            xg,
            w[t * g : (t + 1) * g, :],
            preferred_element_type=jnp.float32,
        )
        if bias_correction:
            part -= bias_correction * jnp.sum(
                xg.astype(jnp.float32), axis=-1, keepdims=True
            )
        s_row = s_ref[pl.ds(row_base + t, 1), :]
        acc_ref[:] += part * s_row.astype(jnp.float32)


def _kernel_body(
    nk: int,
    epilogue: Epilogue,
    out_dtype,
    bits: int,
    group_in_loop: int | None,  # g when scales applied inside the k-loop
    prenorm: tuple[float, float] | None,  # (eps, 1/logical_k) when fused
    *refs,
):
    """Grid (nm, nn, nk). Ref order:
    int8: x, w, s, [gamma], [bias], [residual], out, acc
    int4: x_lo, x_hi, w, s, [bias], [residual], out, acc
    """
    refs = list(refs)
    acc_ref = refs.pop()
    out_ref = refs.pop()
    if bits == 4:
        x_lo_ref, x_hi_ref, w_ref = refs[:3]
        refs = refs[3:]
    else:
        x_lo_ref, w_ref = refs[:2]
        x_hi_ref = None
        refs = refs[2:]
    s_ref = refs.pop(0)
    gamma_ref = refs.pop(0) if prenorm is not None else None
    b_ref = refs.pop(0) if epilogue.has_bias else None
    r_ref = refs.pop(0) if epilogue.residual else None
    assert not refs

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_in_loop
    dtype = x_lo_ref.dtype
    bk = w_ref.shape[0]
    s_in = None if g is None else s_ref
    row_base = None if g is None else (k * bk) // g

    def load_x(ref):
        x = ref[:]
        if prenorm is None:
            return x
        # Fused RMSNorm prologue: the block holds the FULL logical row
        # (whole-K decode blocks), so the norm is computed in-register —
        # removes the separate XLA rmsnorm + HBM round-trip of y. Padded
        # columns are zeros and don't perturb the sum; divide by the
        # LOGICAL k. Recomputed per column-block (trivial VPU work vs the
        # 1 MiB weight DMA).
        eps, inv_k = prenorm
        xf = x.astype(jnp.float32)
        var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_k
        y = xf * jax.lax.rsqrt(var + eps) * gamma_ref[:].astype(jnp.float32)
        return y.astype(dtype)

    if bits == 4:
        # Nibble split with BITWISE int8 ops (Mosaic legalizes neither int8
        # shifts nor int8 add/sub, but and/xor are native lane ops). For
        # w = (hi << 4) | (lo & 0xF), two's complement gives:
        #   hi16     = w & 0xF0          (= 16 * hi EXACTLY, sign included)
        #   lo_bias8 = (w & 15) ^ 8      (= lo + 8 EXACTLY, in [0, 15])
        # The low dot runs against the BIASED nibbles — the -8 debias is a
        # [bm, 1] rowsum-of-x correction on the accumulator (dot identity:
        # x @ (lo+8) - 8*rowsum(x) == x @ lo) instead of a [bk, bn] vector
        # subtract over the weight block. And instead of dividing the
        # weight block by 16, the 1/16 folds into the TINY [bm, bk] x
        # block (exact: power of two). Weight-side VPU work per byte: two
        # int8 bitwise ops + the two unavoidable int->bf16 converts.
        w8 = w_ref[:]
        lo_bias8 = jax.lax.bitwise_xor(
            jax.lax.bitwise_and(w8, jnp.int8(15)), jnp.int8(8)
        )
        hi16 = jax.lax.bitwise_and(w8, jnp.int8(0xF0 - 256))
        x_hi = (x_hi_ref[:].astype(jnp.float32) * (1.0 / 16.0)).astype(dtype)
        _dot_scaled(x_lo_ref[:], lo_bias8, s_in, g, row_base, acc_ref, dtype,
                    bias_correction=8.0)
        # high-half logical rows start at nk * bk
        hi_base = None if g is None else ((k + nk) * bk) // g
        _dot_scaled(x_hi, hi16, s_in, g, hi_base, acc_ref, dtype)
    else:
        _dot_scaled(load_x(x_lo_ref), w_ref[:], s_in, g, row_base, acc_ref, dtype)

    @pl.when(k == nk - 1)
    def _epilogue():
        r = acc_ref[:]
        if g is None:
            # per-channel: the single hoisted scale multiply
            r = r * s_ref[:].astype(jnp.float32)
        if b_ref is not None:
            r = r + b_ref[:].astype(jnp.float32)
        r = _ACTIVATIONS[epilogue.activation](r)
        if r_ref is not None:
            res = r_ref[:].astype(jnp.float32)
            r = r + res if epilogue.residual == "add" else r * res
        # out may carry FEWER rows than the compute block (decode: m < bm,
        # emitted exactly so no XLA row-slice of the custom-call output —
        # those materialize as real copies, ~2 ms/step on llama2-7b decode)
        out_rows = out_ref.shape[-2]
        out_ref[:] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "epilogue", "bits", "group_size", "interpret", "out_rows",
        "prenorm",
    ),
)
def w8a16_matmul_kernel_call(
    x: jax.Array,
    w_packed_data: jax.Array,
    scales: jax.Array,
    bias: jax.Array | None,
    residual: jax.Array | None,
    config: MatmulConfig,
    epilogue: Epilogue,
    interpret: bool = False,
    bits: int = 8,
    group_size: int | None = None,
    out_rows: int | None = None,
    prenorm: tuple[float, float] | None = None,
    prenorm_gamma: jax.Array | None = None,
) -> jax.Array:
    """Raw kernel invocation on pre-padded operands.

    x: [Mp, Kp] (Mp % bm == 0, Kp % bk == 0), float
    w_packed_data: int8 [Kp, Np] (bits=8) or [Kp/2, Np] (bits=4 split-half)
    scales: [1, Np] (per-channel) or [G, Np] (group-wise, g = Kp/G)
    bias: [1, Np] or None; residual: [Mp, Np] or None
    out_rows: emit only the first out_rows rows (requires Mp == bm, i.e. a
      single row-block grid — the decode regime). Avoids the caller slicing
      the custom-call output, which XLA materializes as a copy.
    prenorm: (eps, 1/logical_k) to fuse an RMSNorm prologue on x (requires
      whole-K blocks: Kp == bk, int8, with prenorm_gamma [1, Kp]).
    Returns [Mp or out_rows, Np] in x.dtype.
    """
    mp, kp = x.shape
    np_ = w_packed_data.shape[-1]
    if bits == 4:
        assert w_packed_data.shape[0] * 2 == kp, (x.shape, w_packed_data.shape)
    else:
        assert w_packed_data.shape[0] == kp, (x.shape, w_packed_data.shape)
    bm, bn, bk = config.bm, config.bn, config.bk
    # bk counts PACKED weight rows per block; for int4 each block covers
    # bk low-half + bk high-half logical rows, fetched as two x blocks.
    kp_data = w_packed_data.shape[0]
    assert mp % bm == 0 and np_ % bn == 0 and kp_data % bk == 0, (
        x.shape,
        w_packed_data.shape,
        config,
    )
    nm, nn, nk = mp // bm, np_ // bn, kp_data // bk

    if scales.ndim == 1:
        scales = scales.reshape(1, np_)
    group_in_loop = None
    s_rows = scales.shape[0]
    if s_rows > 1:
        g = kp // s_rows
        if not (bk % g == 0 or g % bk == 0):
            raise ValueError(
                f"group size {g} incompatible with bk {bk}: need bk % g == 0 "
                f"or g % bk == 0"
            )
        if bits == 4 and bk % g != 0:
            raise ValueError("int4 group-wise requires bk % group == 0")
        group_in_loop = g

    if prenorm is not None:
        if nk != 1 or bits != 8 or prenorm_gamma is None:
            raise ValueError(
                "prenorm fusion requires whole-K int8 blocks and a gamma"
            )

    in_specs = [pl.BlockSpec((bm, bk), lambda i, j, k: (i, k))]
    operands: list[jax.Array] = [x]
    if bits == 4:
        in_specs.append(pl.BlockSpec((bm, bk), lambda i, j, k, nk=nk: (i, k + nk)))
        operands.append(x)
    in_specs.append(pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)))
    operands.append(w_packed_data)

    # scale blocks: per-channel gets the (1, bn) row; group-wise keeps ALL
    # scale rows resident (rows are tiny; full-dim blocks are exempt from
    # the (8, 128) min-tile rule) and the kernel dynamic-slices its row.
    if group_in_loop is not None:
        in_specs.append(
            pl.BlockSpec((s_rows, bn), lambda i, j, k: (0, j))
        )
        operands.append(scales)
    else:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(scales)

    if prenorm is not None:
        in_specs.append(pl.BlockSpec((1, bk), lambda i, j, k: (0, k)))
        operands.append(prenorm_gamma.reshape(1, kp))

    if epilogue.has_bias:
        assert bias is not None
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, np_))
    if epilogue.residual:
        assert residual is not None and residual.shape == (mp, np_)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
        operands.append(residual)

    out_m, out_m_block = mp, bm
    if out_rows is not None and out_rows != mp:
        if nm != 1 or out_rows > bm:
            raise ValueError(
                f"out_rows={out_rows} requires a single row block (mp={mp}, "
                f"bm={bm})"
            )
        out_m = out_m_block = out_rows

    kernel = functools.partial(
        _kernel_body, nk, epilogue, x.dtype, bits, group_in_loop, prenorm
    )
    # NO cost_estimate: supplying one makes XLA's memory-space-assignment
    # stage whole weights into VMEM via serialized async slices ahead of the
    # kernel (+2.1 ms/step on llama2-7b decode, traced); without it the
    # kernel streams HBM itself at 750-870 GB/s. Measured: 12.1 -> 11.0
    # ms/step.
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_m_block, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((out_m, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


def _expert_kernel_body(
    nk: int,
    out_dtype,
    bits: int,
    group_in_loop: int | None,
    *refs,
):
    """Expert-indexed matmul body. Grid (n_sel, nm, nn, nk); the expert id of
    selection s is scalar-prefetched and consumed by the BLOCK INDEX MAPS
    (the weight bank never moves — only the selected expert's blocks are
    DMA'd), so the body itself is the plain dequant-matmul loop.

    Ref order (after the scalar-prefetch eids ref, which Pallas passes
    first): int8: eids, x, w, s, out, acc; int4: eids, x_lo, x_hi, w, s,
    out, acc. w/s blocks carry a leading length-1 expert axis.
    """
    refs = list(refs)
    refs.pop(0)  # eids: consumed by index maps only
    acc_ref = refs.pop()
    out_ref = refs.pop()
    if bits == 4:
        x_lo_ref, x_hi_ref, w_ref, s_ref = refs
    else:
        x_lo_ref, w_ref, s_ref = refs
        x_hi_ref = None

    k = pl.program_id(3)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = group_in_loop
    dtype = x_lo_ref.dtype
    bk = w_ref.shape[1]
    s_in = None if g is None else s_ref.at[0]  # 2-D [Gp, bn] view
    row_base = None if g is None else (k * bk) // g

    if bits == 4:
        w8 = w_ref[0]
        lo_bias8 = jax.lax.bitwise_xor(
            jax.lax.bitwise_and(w8, jnp.int8(15)), jnp.int8(8)
        )
        hi16 = jax.lax.bitwise_and(w8, jnp.int8(0xF0 - 256))
        x_hi = (x_hi_ref[:].astype(jnp.float32) * (1.0 / 16.0)).astype(dtype)
        _dot_scaled(x_lo_ref[:], lo_bias8, s_in, g, row_base, acc_ref, dtype,
                    bias_correction=8.0)
        hi_base = None if g is None else ((k + nk) * bk) // g
        _dot_scaled(x_hi, hi16, s_in, g, hi_base, acc_ref, dtype)
    else:
        _dot_scaled(x_lo_ref[:], w_ref[0], s_in, g, row_base, acc_ref, dtype)

    @pl.when(k == nk - 1)
    def _epilogue():
        r = acc_ref[:]
        if g is None:
            r = r * s_ref[0].astype(jnp.float32)  # [1, bn] broadcasts
        out_rows = out_ref.shape[-2]
        out_ref[0] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "bits", "group_size", "interpret", "out_rows"),
)
def w8a16_expert_matmul_kernel_call(
    x: jax.Array,
    w_packed_data: jax.Array,
    scales: jax.Array,
    expert_ids: jax.Array,
    config: MatmulConfig,
    interpret: bool = False,
    bits: int = 8,
    group_size: int | None = None,
    out_rows: int | None = None,
) -> jax.Array:
    """Expert-indexed matmul on a stacked weight BANK — the MoE hot path.

    out[s] = x @ dequant(bank[expert_ids[s]]) for each selection s, in ONE
    kernel dispatch: `expert_ids` is scalar-prefetched (the same mechanism
    as the paged flash-decode block table) and the weight-block index map
    picks the selected expert's tiles straight out of HBM — no [Kp, Np]
    dynamic-slice copy per expert, and bytes streamed are exactly the
    selected experts' (2/8ths of a Mixtral layer at top-2, not 8/8ths).

    x: [Mp, Kp]; w_packed_data: int8 [E, Kp, Np] ([E, Kp/2, Np] int4);
    scales: [E, 1, Np] per-channel or [E, Gp, Np] group-wise;
    expert_ids: [n_sel] int32. Returns [n_sel, Mp (or out_rows), Np].
    """
    mp, kp = x.shape
    n_sel = expert_ids.shape[0]
    np_ = w_packed_data.shape[-1]
    kp_data = w_packed_data.shape[-2]
    if bits == 4:
        assert kp_data * 2 == kp, (x.shape, w_packed_data.shape)
    else:
        assert kp_data == kp, (x.shape, w_packed_data.shape)
    bm, bn, bk = config.bm, config.bn, config.bk
    assert mp % bm == 0 and np_ % bn == 0 and kp_data % bk == 0, (
        x.shape, w_packed_data.shape, config,
    )
    nm, nn, nk = mp // bm, np_ // bn, kp_data // bk

    group_in_loop = None
    s_rows = scales.shape[1]
    if s_rows > 1:
        g = kp // s_rows
        if not (bk % g == 0 or g % bk == 0):
            raise ValueError(
                f"group size {g} incompatible with bk {bk}"
            )
        if bits == 4 and bk % g != 0:
            raise ValueError("int4 group-wise requires bk % group == 0")
        group_in_loop = g

    in_specs = [
        pl.BlockSpec((bm, bk), lambda s, i, j, k, eids: (i, k)),
    ]
    operands: list[jax.Array] = [x]
    if bits == 4:
        in_specs.append(
            pl.BlockSpec((bm, bk), lambda s, i, j, k, eids, nk=nk: (i, k + nk))
        )
        operands.append(x)
    in_specs.append(
        pl.BlockSpec((1, bk, bn), lambda s, i, j, k, eids: (eids[s], k, j))
    )
    operands.append(w_packed_data)
    in_specs.append(
        pl.BlockSpec((1, s_rows, bn), lambda s, i, j, k, eids: (eids[s], 0, j))
    )
    operands.append(scales)

    out_m, out_m_block = mp, bm
    if out_rows is not None and out_rows != mp:
        if nm != 1 or out_rows > bm:
            raise ValueError(
                f"out_rows={out_rows} requires a single row block (mp={mp})"
            )
        out_m = out_m_block = out_rows

    kernel = functools.partial(
        _expert_kernel_body, nk, x.dtype, bits, group_in_loop
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_sel, nm, nn, nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_m_block, bn), lambda s, i, j, k, eids: (s, i, j)
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_sel, out_m, np_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(expert_ids.astype(jnp.int32), *operands)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("config", "bits", "group_size", "interpret"),
)
def w8a16_grouped_matmul_kernel_call(
    x: jax.Array,
    w_packed_data: jax.Array,
    scales: jax.Array,
    block_expert: jax.Array,
    config: MatmulConfig,
    interpret: bool = False,
    bits: int = 8,
    group_size: int | None = None,
) -> jax.Array:
    """Token-grouped expert GEMM — the routed MoE PREFILL hot path.

    The caller sorts the (token, expert) selections by expert and packs
    their activation rows into `x` so every bm-row block belongs to ONE
    expert, recorded in `block_expert` (MegaBlocks-style grouped GEMM,
    static shapes). Shares `_expert_kernel_body` with the decode gather:
    the only difference is that the row-block index (not a selection
    index) drives the grid, so out[b*bm:(b+1)*bm] = x[b*bm:(b+1)*bm] @
    dequant(bank[block_expert[b]]). Streams each selected expert's tiles
    once per owning block — the routed-FLOPs path the masked scan (E/k
    times the work) approximates from above.

    x: [Mp, Kp] with Mp = nb * bm; w_packed_data: int8 [E, Kp, Np]
    ([E, Kp/2, Np] int4); scales: [E, 1, Np] or [E, Gp, Np];
    block_expert: [nb] int32 (garbage blocks must still carry a VALID
    expert id — their rows are dropped by the caller). Returns [Mp, Np].
    """
    mp, kp = x.shape
    np_ = w_packed_data.shape[-1]
    kp_data = w_packed_data.shape[-2]
    if bits == 4:
        assert kp_data * 2 == kp, (x.shape, w_packed_data.shape)
    else:
        assert kp_data == kp, (x.shape, w_packed_data.shape)
    bm, bn, bk = config.bm, config.bn, config.bk
    nb = block_expert.shape[0]
    assert mp == nb * bm and np_ % bn == 0 and kp_data % bk == 0, (
        x.shape, w_packed_data.shape, config, nb,
    )
    nn, nk = np_ // bn, kp_data // bk

    group_in_loop = None
    s_rows = scales.shape[1]
    if s_rows > 1:
        g = kp // s_rows
        if not (bk % g == 0 or g % bk == 0):
            raise ValueError(f"group size {g} incompatible with bk {bk}")
        if bits == 4 and bk % g != 0:
            raise ValueError("int4 group-wise requires bk % group == 0")
        group_in_loop = g

    # grid (nb, 1, nn, nk): the leading dim is the ROW BLOCK; x blocks are
    # indexed by it and the weight/scale blocks by its prefetched expert
    in_specs = [
        pl.BlockSpec((bm, bk), lambda s, i, j, k, eids: (s, k)),
    ]
    operands: list[jax.Array] = [x]
    if bits == 4:
        in_specs.append(
            pl.BlockSpec((bm, bk), lambda s, i, j, k, eids, nk=nk: (s, k + nk))
        )
        operands.append(x)
    in_specs.append(
        pl.BlockSpec((1, bk, bn), lambda s, i, j, k, eids: (eids[s], k, j))
    )
    operands.append(w_packed_data)
    in_specs.append(
        pl.BlockSpec((1, s_rows, bn), lambda s, i, j, k, eids: (eids[s], 0, j))
    )
    operands.append(scales)

    kernel = functools.partial(
        _expert_kernel_body, nk, x.dtype, bits, group_in_loop
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, 1, nn, nk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bm, bn), lambda s, i, j, k, eids: (s, i, j)
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, bm, np_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_expert.astype(jnp.int32), *operands)
    return out.reshape(mp, np_)


def w8a16_matmul_ref(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = None,
    residual: jax.Array | None = None,
    residual_mode: str = "add",
) -> jax.Array:
    """Pure-jnp reference implementation (testing oracle + CPU fallback).

    qweight: logical int8 [K, N] (int4 values sign-extended to int8).
    scales: [N] per-channel or [G, N] group-wise.
    Per-channel matches the kernel bit-for-bit in f32 (bf16 dequantized
    matmul, f32 accumulation, scale on the accumulator); group-wise applies
    each group's scale to that group's f32 partial sum, like the kernel.
    """
    if scales.ndim == 1:
        acc = jnp.dot(
            x, qweight.astype(x.dtype), preferred_element_type=jnp.float32
        )
        r = acc * scales.astype(jnp.float32)[None, :]
    else:
        kdim, n = qweight.shape
        gcount = scales.shape[0]
        g = kdim // gcount
        xg = x.reshape(*x.shape[:-1], gcount, g)
        wg = qweight.reshape(gcount, g, n)
        # [..., G, N] partial dots, scaled per group, summed in f32
        parts = jnp.einsum(
            "...gk,gkn->...gn",
            xg,
            wg.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        r = jnp.sum(parts * scales.astype(jnp.float32), axis=-2)
    if bias is not None:
        r = r + bias.astype(jnp.float32)[None, :]
    r = _ACTIVATIONS[activation](r)
    if residual is not None:
        res = residual.astype(jnp.float32)
        r = r + res if residual_mode == "add" else r * res
    return r.astype(x.dtype)
