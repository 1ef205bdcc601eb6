"""Fused dequant + matmul Pallas kernels: the W8A16 hot path.

One kernel template serves both regimes the reference implements as two
separate CUDA code bases (~4k LoC):

- prefill / large-batch tiled GEMM — the CUTLASS fpA_intB path
  (`csrc/cutlass_kernels/fpA_intB_gemm/fpA_intB_gemm_template.h`), and
- decode batched GEMV for m <= MAX_DECODE_M — the TRT-LLM path
  (`csrc/weightOnlyBatchedGemv/kernel.h`).

On TPU the two regimes differ only in block configuration (chosen by
`eetq_tpu.kernels.autotune`): the decode config uses whole-K weight blocks so
the int8 weight streams from HBM exactly once at full bandwidth, while the
prefill config uses large square output tiles that keep the MXU fed. Pallas'
grid pipeline replaces the hand-written cp.async multistage pipelining
(`dq_mma_multistage.h`), and the MXU consumes bf16 directly, so "dequant" is
an in-register int8->bf16 convert with the per-channel scale applied ONCE to
the f32 accumulator at the last K step (scales commute with the K-sum — the
same invariant the reference maintains with its warp-level dequantizer,
`mma_tensorop_dequantizer.h:152-183`, just hoisted out of the inner loop).

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


def _kernel_body(nk: int, epilogue: Epilogue, out_dtype, *refs):
    if epilogue.has_bias and epilogue.residual:
        x_ref, w_ref, s_ref, b_ref, r_ref, out_ref, acc_ref = refs
    elif epilogue.has_bias:
        x_ref, w_ref, s_ref, b_ref, out_ref, acc_ref = refs
        r_ref = None
    elif epilogue.residual:
        x_ref, w_ref, s_ref, r_ref, out_ref, acc_ref = refs
        b_ref = None
    else:
        x_ref, w_ref, s_ref, out_ref, acc_ref = refs
        b_ref = r_ref = None

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 -> activation dtype is exact (|q| <= 128 fits bf16's 8-bit
    # mantissa); MXU matmul in bf16 with f32 accumulation.
    w = w_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _epilogue():
        r = acc_ref[:] * s_ref[:].astype(jnp.float32)  # per-channel dequant
        if b_ref is not None:
            r = r + b_ref[:].astype(jnp.float32)
        r = _ACTIVATIONS[epilogue.activation](r)
        if r_ref is not None:
            res = r_ref[:].astype(jnp.float32)
            r = r + res if epilogue.residual == "add" else r * res
        out_ref[:] = r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "epilogue", "interpret"),
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
) -> jax.Array:
    """Raw kernel invocation on pre-padded operands.

    x: [Mp, Kp] (Mp % bm == 0, Kp % bk == 0), float
    w_packed_data: [Kp, Np] int8 (PackedWeight.data)
    scales: [Np] float
    bias: [Np] or None; residual: [Mp, Np] or None
    Returns [Mp, Np] in x.dtype.
    """
    mp, kp = x.shape
    kp2, np_ = w_packed_data.shape
    assert kp == kp2, (x.shape, w_packed_data.shape)
    bm, bn, bk = config.bm, config.bn, config.bk
    assert mp % bm == 0 and np_ % bn == 0 and kp % bk == 0, (x.shape, config)
    nm, nn, nk = mp // bm, np_ // bn, kp // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    operands = [x, w_packed_data, scales.reshape(1, np_)]
    if epilogue.has_bias:
        assert bias is not None
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        operands.append(bias.reshape(1, np_))
    if epilogue.residual:
        assert residual is not None and residual.shape == (mp, np_)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
        operands.append(residual)

    kernel = functools.partial(_kernel_body, nk, epilogue, x.dtype)
    x_bytes = x.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=mp * kp * x_bytes + kp * np_ + mp * np_ * x_bytes + np_ * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


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

    Matches the kernel bit-for-bit in f32: bf16 dequantized matmul with f32
    accumulation, scale applied to the accumulator.
    """
    acc = jnp.dot(
        x, qweight.astype(x.dtype), preferred_element_type=jnp.float32
    )
    r = acc * scales.astype(jnp.float32)[None, :]
    if bias is not None:
        r = r + bias.astype(jnp.float32)[None, :]
    r = _ACTIVATIONS[activation](r)
    if residual is not None:
        res = residual.astype(jnp.float32)
        r = r + res if residual_mode == "add" else r * res
    return r.astype(x.dtype)
