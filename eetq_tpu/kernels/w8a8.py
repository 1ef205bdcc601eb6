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
    """jnp oracle: per-token quantize activations, integer matmul, dequant."""
    xq, sx = quantize_activations(x)
    acc = jnp.einsum(
        "...k,kn->...n",
        xq.astype(jnp.int32),
        qweight.astype(jnp.int32),
    ).astype(jnp.float32)
    r = acc * sx[..., None] * w_scales.astype(jnp.float32)
    if bias is not None:
        r = r + bias.astype(jnp.float32)
    r = _ACTIVATIONS[activation](r)
    return r.astype(x.dtype)
