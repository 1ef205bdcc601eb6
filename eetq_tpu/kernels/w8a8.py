"""W8A8 fused matmul: int8 activations x int8 weights on the MXU.

The reference ships (unused) full-int8 GEMM epilogue infrastructure carried
from FasterTransformer — per-row/per-col rescale epilogues, int32 epilogues,
QuantMode{PerToken,PerChannel} (`cutlass_extensions/epilogue/...`,
`epilogue_quant_helper.h:36-42`, SURVEY.md §2.2). Here it is a live path:
dynamic per-token activation quantization + per-channel weight scales, s8xs8
MXU matmul with s32 accumulation (2x bf16 MXU throughput on v5e), f32
dequant epilogue out = acc * row_scale * col_scale (+bias, activation).

Intended for the PREFILL regime (compute-bound; decode is weight-bandwidth
bound where int8 activations buy nothing). Accuracy: per-token absmax int8
activations are the standard "W8A8 smooth-free" tradeoff; use W8A16 when
logits-exactness matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eetq_tpu.kernels.autotune import MatmulConfig
from eetq_tpu.kernels.w8a16 import _ACTIVATIONS, Epilogue


@functools.partial(jax.jit, static_argnames=())
def quantize_activations(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token (last-axis) symmetric int8 quantization of activations.

    x: [..., K] float. Returns (q int8 [..., K], scales f32 [...]).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(
        jnp.round(xf / safe[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _w8a8_kernel(nk: int, epilogue: Epilogue, out_dtype, *refs):
    refs = list(refs)
    acc_ref = refs.pop()
    out_ref = refs.pop()
    x_ref, w_ref, sx_ref, sw_ref = refs[:4]
    refs = refs[4:]
    b_ref = refs.pop(0) if epilogue.has_bias else None
    r_ref = refs.pop(0) if epilogue.residual else None
    assert not refs

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # s8 x s8 -> s32 on the MXU (2x bf16 throughput)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _epilogue():
        r = acc_ref[:].astype(jnp.float32)
        # out = acc * row_scale * col_scale (PerTokenChannel requant,
        # reference epilogue_quant_helper.h QuantMode)
        r = r * sx_ref[:, :1].astype(jnp.float32)
        r = r * sw_ref[:].astype(jnp.float32)
        if b_ref is not None:
            r = r + b_ref[:].astype(jnp.float32)
        r = _ACTIVATIONS[epilogue.activation](r)
        if r_ref is not None:
            res = r_ref[:].astype(jnp.float32)
            r = r + res if epilogue.residual == "add" else r * res
        out_rows = out_ref.shape[-2]
        out_ref[:] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "epilogue", "out_dtype", "interpret")
)
def w8a8_matmul_kernel_call(
    xq: jax.Array,       # int8 [Mp, Kp]
    w_data: jax.Array,   # int8 [Kp, Np]
    x_scales: jax.Array, # f32 [Mp, 1] per-token
    w_scales: jax.Array, # f32 [1, Np] per-channel
    bias: jax.Array | None,
    residual: jax.Array | None,
    config: MatmulConfig,
    epilogue: Epilogue,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    mp, kp = xq.shape
    kp2, np_ = w_data.shape
    assert kp == kp2
    bm, bn, bk = config.bm, config.bn, config.bk
    assert mp % bm == 0 and np_ % bn == 0 and kp % bk == 0
    nm, nn, nk = mp // bm, np_ // bn, kp // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    operands = [xq, w_data, x_scales, w_scales]
    if epilogue.has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, np_))
    if epilogue.residual:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
        operands.append(residual)

    kernel = functools.partial(_w8a8_kernel, nk, epilogue, out_dtype)
    # no cost_estimate — see w8a16.py (MSA weight staging regression)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


def w8a8_matmul_ref(x, qweight, w_scales, bias=None, activation=None):
    """jnp oracle: per-token quantize activations, integer matmul, dequant.

    w_scales: [N] per-channel, or [G, N] group-wise (g = K // G) — the
    group-wise case dequantizes per-group integer partial sums, matching
    the kernel's accumulation semantics exactly up to f32 summation order.
    """
    xq, sx = quantize_activations(x)
    if w_scales.ndim == 1:
        acc = jnp.einsum(
            "...k,kn->...n",
            xq.astype(jnp.int32),
            qweight.astype(jnp.int32),
        ).astype(jnp.float32)
        r = acc * sx[..., None] * w_scales.astype(jnp.float32)
    else:
        gcount = w_scales.shape[0]
        k, n = qweight.shape
        g = k // gcount
        part = jnp.einsum(
            "...gk,gkn->...gn",
            xq.reshape(*xq.shape[:-1], gcount, g).astype(jnp.int32),
            qweight.reshape(gcount, g, n).astype(jnp.int32),
        ).astype(jnp.float32)
        r = jnp.einsum(
            "...gn,gn->...n", part, w_scales.astype(jnp.float32)
        ) * sx[..., None]
    if bias is not None:
        r = r + bias.astype(jnp.float32)
    r = _ACTIVATIONS[activation](r)
    return r.astype(x.dtype)


# ---- W4A8: int4 split-half-packed weights x int8 activations ----


def _idot(x, w):
    """s8 x s8 -> s32 MXU dot."""
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _w4a8_kernel(nk: int, g: int | None, epilogue: Epilogue, out_dtype,
                 *refs):
    """Grid (nm, nn, nk). Refs:
    x_lo, x_hi, w, sx, sw, [bias], [residual], out, acc(f32).

    Same biased-nibble unpack as the W4A16 kernel (w8a16.py: Mosaic
    legalizes int8 and/xor but not int8 add/sub or shifts):
      lo_bias8 = (w & 15) ^ 8   (= lo + 8); debias via -8 * rowsum(x_lo)
      hi16     = w & 0xF0       (= 16 * hi exactly, incl. sign)
    but the dots run in INTEGER (s8 x s8 -> s32 on the MXU, 2x bf16
    throughput); the 1/16 of the high half and the -8 debias stay exact in
    i32/f32. Per-channel scales apply once in the epilogue; group-wise
    scales apply per logical-row group to the f32-converted partial dots
    (lo and hi halves live in DIFFERENT groups: logical rows r and
    r + K/2)."""
    refs = list(refs)
    acc_ref = refs.pop()
    out_ref = refs.pop()
    x_lo_ref, x_hi_ref, w_ref, sx_ref, sw_ref = refs[:5]
    refs = refs[5:]
    b_ref = refs.pop(0) if epilogue.has_bias else None
    r_ref = refs.pop(0) if epilogue.residual else None
    assert not refs

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w8 = w_ref[:]
    lo_bias8 = jax.lax.bitwise_xor(
        jax.lax.bitwise_and(w8, jnp.int8(15)), jnp.int8(8)
    )
    hi16 = jax.lax.bitwise_and(w8, jnp.int8(0xF0 - 256))
    bk = w8.shape[0]

    if g is None:
        # single fused i32 accumulation: 16*(x_lo @ lo) + (x_hi @ 16*hi)
        # == 16 * (x_lo @ lo + x_hi @ hi); the /16 folds into the epilogue
        # scale. |acc| <= 16 * K * 127 * 8 — safely inside i32 for any
        # transformer K, and within f32's 2^24 mantissa per k-block.
        d = (
            (
                _idot(x_lo_ref[:], lo_bias8)
                - 8
                * jnp.sum(
                    x_lo_ref[:].astype(jnp.int32), axis=-1, keepdims=True
                )
            )
            * 16
            + _idot(x_hi_ref[:], hi16)
        )
        acc_ref[:] += d.astype(jnp.float32)
    else:
        # group-wise: scale each group's i32 partial dot in f32. Block k's
        # low half covers logical rows [k*bk, (k+1)*bk); the high half
        # starts nk*bk logical rows later (split-half packing).
        lo_base = (k * bk) // g
        hi_base = ((k + nk) * bk) // g
        step = min(g, bk)
        for t in range(bk // step):
            sl = slice(t * step, (t + 1) * step)
            xl = x_lo_ref[:, sl]
            part_lo = (
                _idot(xl, lo_bias8[sl, :])
                - 8 * jnp.sum(xl.astype(jnp.int32), axis=-1, keepdims=True)
            ).astype(jnp.float32)
            part_hi = _idot(x_hi_ref[:, sl], hi16[sl, :]).astype(jnp.float32)
            s_lo = sw_ref[pl.ds(lo_base + t, 1), :].astype(jnp.float32)
            s_hi = sw_ref[pl.ds(hi_base + t, 1), :].astype(jnp.float32)
            acc_ref[:] += part_lo * s_lo + part_hi * (s_hi * (1.0 / 16.0))

    @pl.when(k == nk - 1)
    def _epilogue():
        r = acc_ref[:]
        sx = sx_ref[:, :1].astype(jnp.float32)
        if g is None:
            # fold the high-half /16 (and the lo x16) back out here
            r = r * (sx * (1.0 / 16.0)) * sw_ref[:].astype(jnp.float32)
        else:
            r = r * sx
        if b_ref is not None:
            r = r + b_ref[:].astype(jnp.float32)
        r = _ACTIVATIONS[epilogue.activation](r)
        if r_ref is not None:
            res = r_ref[:].astype(jnp.float32)
            r = r + res if epilogue.residual == "add" else r * res
        out_rows = out_ref.shape[-2]
        out_ref[:] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("config", "epilogue", "out_dtype", "interpret")
)
def w4a8_matmul_kernel_call(
    xq: jax.Array,       # int8 [Mp, Kp] (Kp = LOGICAL padded rows)
    w_data: jax.Array,   # int8 [Kp/2, Np] split-half nibble-packed
    x_scales: jax.Array, # f32 [Mp, 1] per-token
    w_scales: jax.Array, # f32 [1, Np] per-channel or [G, Np] group-wise
    bias: jax.Array | None,
    residual: jax.Array | None,
    config: MatmulConfig,
    epilogue: Epilogue,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    mp, kp = xq.shape
    kp_data, np_ = w_data.shape
    assert kp_data * 2 == kp, (xq.shape, w_data.shape)
    bm, bn, bk = config.bm, config.bn, config.bk
    assert mp % bm == 0 and np_ % bn == 0 and kp_data % bk == 0
    nm, nn, nk = mp // bm, np_ // bn, kp_data // bk

    g = None
    s_rows = w_scales.shape[0]
    if s_rows > 1:
        g = kp // s_rows
        if bk % g != 0 and g % bk != 0:
            raise ValueError(f"group size {g} incompatible with bk {bk}")

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bm, bk), lambda i, j, k, nk=nk: (i, k + nk)),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
    ]
    operands = [xq, xq, w_data, x_scales]
    if g is not None:
        # all scale rows resident; the kernel dynamic-slices its rows
        in_specs.append(pl.BlockSpec((s_rows, bn), lambda i, j, k: (0, j)))
    else:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
    operands.append(w_scales)
    if epilogue.has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, np_))
    if epilogue.residual:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
        operands.append(residual)

    kernel = functools.partial(_w4a8_kernel, nk, g, epilogue, out_dtype)
    # no cost_estimate — see w8a16.py (MSA weight staging regression)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
