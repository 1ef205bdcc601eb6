"""Fused MLP decode kernel: RMSNorm -> gate/up GEMV -> swiglu -> down GEMV
-> (+residual) in ONE Pallas call.

Decode is launch- and glue-bound after the GEMVs hit HBM roofline: a
llama2-7b step runs ~129 kernels (~9 us launch each) plus XLA elementwise
fusions between them (trace: 0.94 ms/step tail). The MLP block is
gateup-GEMV, an XLA split+silu+mul pass, and down-GEMV — three dispatches
per layer whose intermediates bounce through HBM. This kernel runs the
whole block as one grid:

  grid = (I / bi,)           # intermediate dim, bi columns per step
  step i:  y    = rmsnorm(x) * gamma                 (VPU, recomputed)
           g,u  = y @ Wg[:, i], y @ Wu[:, i]         (two MXU dots)
           h    = silu(g) * u                        (VPU)
           acc += h @ Wd[i, :]                       (MXU, f32 accumulator)
  last:    out  = acc * down_scales (+ residual)

The output [m, K] accumulates entirely in VMEM (decode m <= 8 -> the f32
accumulator is ~128 KB), so every weight byte still streams from HBM
exactly once — same traffic as the separate kernels, minus the
intermediate-activation round trips and two kernel launches per layer.

Counterpart of the reference's fused gemm_bias_act + residual epilogues
(`fpA_intB_gemm_template.h:804`, `ffn.py` gated-act path) taken one step
further — the reference still launches gate/up and down separately.

int8 per-channel weights only (the W8A16 decode configuration); int4 and
group-wise stay on the two-kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ni: int, eps: float, inv_k: float, activation: str,
            has_residual: bool, out_dtype, *refs):
    refs = list(refs)
    acc_ref = refs.pop()
    out_ref = refs.pop()
    (x_ref, gamma_ref, g_ref, u_ref, sg_ref, su_ref, d_ref, sd_ref) = refs[:8]
    refs = refs[8:]
    r_ref = refs.pop(0) if has_residual else None
    assert not refs

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fused RMSNorm prologue (recomputed per step: trivial VPU work vs the
    # multi-MB weight DMA; padded x columns are zero and don't perturb the
    # sum — divide by the LOGICAL k via inv_k)
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_k
    y = (xf * jax.lax.rsqrt(var + eps) * gamma_ref[:].astype(jnp.float32)).astype(
        x_ref.dtype
    )

    dtype = x_ref.dtype
    gate = jnp.dot(y, g_ref[:].astype(dtype), preferred_element_type=jnp.float32)
    up = jnp.dot(y, u_ref[:].astype(dtype), preferred_element_type=jnp.float32)
    gate = gate * sg_ref[:].astype(jnp.float32)
    up = up * su_ref[:].astype(jnp.float32)
    if activation == "silu":
        h = gate * jax.lax.logistic(gate) * up
    elif activation == "gelu":
        h = jax.nn.gelu(gate) * up
    else:  # relu
        h = jnp.maximum(gate, 0.0) * up
    acc_ref[:] += jnp.dot(
        h.astype(dtype), d_ref[:].astype(dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == ni - 1)
    def _epilogue():
        r = acc_ref[:] * sd_ref[:].astype(jnp.float32)
        if r_ref is not None:
            r = r + r_ref[:].astype(jnp.float32)
        out_rows = out_ref.shape[-2]
        out_ref[:] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "logical_k", "activation", "bi", "interpret",
                     "out_rows"),
)
def fused_mlp_gemv_call(
    x: jax.Array,          # [Mp, Kp] float (Mp <= 8 decode rows, padded)
    gamma: jax.Array,      # [1, Kp] rmsnorm weight (zero-padded)
    gu_data: jax.Array,    # int8 [Kp, 2*Ip] fused gate|up columns
    gu_scales: jax.Array,  # f32 [1, 2*Ip]
    d_data: jax.Array,     # int8 [Ip, Np] down
    d_scales: jax.Array,   # f32 [1, Np]
    residual: jax.Array | None,  # [Mp, Np] or None
    eps: float,
    logical_k: int,
    activation: str = "silu",
    bi: int = 256,
    interpret: bool = False,
    out_rows: int | None = None,
) -> jax.Array:
    mp, kp = x.shape
    kp2, ip2 = gu_data.shape
    ip, np_ = d_data.shape
    assert kp2 == kp and ip2 == 2 * ip, (gu_data.shape, d_data.shape)
    assert ip % bi == 0, (ip, bi)
    ni = ip // bi

    in_specs = [
        pl.BlockSpec((mp, kp), lambda i: (0, 0)),           # x (whole)
        pl.BlockSpec((1, kp), lambda i: (0, 0)),            # gamma
        pl.BlockSpec((kp, bi), lambda i: (0, i)),           # gate cols
        pl.BlockSpec((kp, bi), lambda i, ni=ni: (0, i + ni)),  # up cols
        pl.BlockSpec((1, bi), lambda i: (0, i)),            # gate scales
        pl.BlockSpec((1, bi), lambda i, ni=ni: (0, i + ni)),   # up scales
        pl.BlockSpec((bi, np_), lambda i: (i, 0)),          # down rows
        pl.BlockSpec((1, np_), lambda i: (0, 0)),           # down scales
    ]
    operands = [x, gamma, gu_data, gu_data, gu_scales, gu_scales, d_data,
                d_scales]
    if residual is not None:
        in_specs.append(pl.BlockSpec((mp, np_), lambda i: (0, 0)))
        operands.append(residual)

    out_m = mp if out_rows is None else out_rows
    kernel = functools.partial(
        _kernel, ni, eps, 1.0 / logical_k, activation, residual is not None,
        x.dtype,
    )
    # no cost_estimate — see w8a16.py (MSA weight staging regression)
    return pl.pallas_call(
        kernel,
        grid=(ni,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_m, np_), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((out_m, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)


def _nibbles(w8):
    """Biased-nibble split (see w8a16.py): lo_bias8 = lo + 8 exactly,
    hi16 = 16 * hi exactly — Mosaic legalizes int8 and/xor only."""
    lo_bias8 = jax.lax.bitwise_xor(
        jax.lax.bitwise_and(w8, jnp.int8(15)), jnp.int8(8)
    )
    hi16 = jax.lax.bitwise_and(w8, jnp.int8(0xF0 - 256))
    return lo_bias8, hi16


def _kernel_i4(ni: int, eps: float, inv_k: float, activation: str,
               has_residual: bool, out_dtype, *refs):
    """int4 per-channel variant. Split-half nibble packing puts the second
    half of each weight's K dimension in the high nibbles, so per step:
    - gate/up columns come in TWO blocks each (intermediate dims i*bi and
      I/2 + i*bi — the two logical halves a down PACKED row block covers);
    - every gate/up dot runs twice (y_lo against low nibbles + y_hi/16
      against hi16), debiased by 8*rowsum(y_lo);
    - the down block's low nibbles consume h_a (dims i*bi..) and its high
      nibbles h_b (dims I/2 + i*bi..), debiased by 8*rowsum(h_a)."""
    refs = list(refs)
    acc_ref = refs.pop()
    out_ref = refs.pop()
    (x_ref, gamma_ref, ga_ref, gb_ref, ua_ref, ub_ref,
     sga_ref, sgb_ref, sua_ref, sub_ref, d_ref, sd_ref) = refs[:12]
    refs = refs[12:]
    r_ref = refs.pop(0) if has_residual else None
    assert not refs

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dtype = x_ref.dtype
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_k
    y = (xf * jax.lax.rsqrt(var + eps) * gamma_ref[:].astype(jnp.float32)).astype(
        dtype
    )
    khalf = y.shape[-1] // 2
    y_lo = y[:, :khalf]
    y_hi16 = (y[:, khalf:].astype(jnp.float32) * (1.0 / 16.0)).astype(dtype)
    rs_y = 8.0 * jnp.sum(y_lo.astype(jnp.float32), axis=-1, keepdims=True)

    def gemv4(w_ref, s_ref):
        lo8, hi16 = _nibbles(w_ref[:])
        part = (
            jnp.dot(y_lo, lo8.astype(dtype),
                    preferred_element_type=jnp.float32)
            - rs_y
            + jnp.dot(y_hi16, hi16.astype(dtype),
                      preferred_element_type=jnp.float32)
        )
        return part * s_ref[:].astype(jnp.float32)

    act = {"silu": lambda g: g * jax.lax.logistic(g),
           "gelu": jax.nn.gelu,
           "relu": lambda g: jnp.maximum(g, 0.0)}[activation]
    h_a = (act(gemv4(ga_ref, sga_ref)) * gemv4(ua_ref, sua_ref)).astype(dtype)
    h_b = (act(gemv4(gb_ref, sgb_ref)) * gemv4(ub_ref, sub_ref)).astype(dtype)

    d_lo8, d_hi16 = _nibbles(d_ref[:])
    rs_h = 8.0 * jnp.sum(h_a.astype(jnp.float32), axis=-1, keepdims=True)
    h_b16 = (h_b.astype(jnp.float32) * (1.0 / 16.0)).astype(dtype)
    acc_ref[:] += (
        jnp.dot(h_a, d_lo8.astype(dtype), preferred_element_type=jnp.float32)
        - rs_h
        + jnp.dot(h_b16, d_hi16.astype(dtype),
                  preferred_element_type=jnp.float32)
    )

    @pl.when(i == ni - 1)
    def _epilogue():
        r = acc_ref[:] * sd_ref[:].astype(jnp.float32)
        if r_ref is not None:
            r = r + r_ref[:].astype(jnp.float32)
        out_rows = out_ref.shape[-2]
        out_ref[:] = r[:out_rows].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "logical_k", "activation", "bi", "interpret",
                     "out_rows"),
)
def fused_mlp_gemv_i4_call(
    x: jax.Array,          # [Mp, Kp] float
    gamma: jax.Array,      # [1, Kp]
    gu_data: jax.Array,    # int8 [Kp/2, 2I] split-half int4 gate|up
    gu_scales: jax.Array,  # f32 [1, 2I] per-channel
    d_data: jax.Array,     # int8 [I/2, Np] split-half int4 down
    d_scales: jax.Array,   # f32 [1, Np]
    residual: jax.Array | None,
    eps: float,
    logical_k: int,
    activation: str = "silu",
    bi: int = 128,
    interpret: bool = False,
    out_rows: int | None = None,
) -> jax.Array:
    mp, kp = x.shape
    kph, ip2 = gu_data.shape
    iph, np_ = d_data.shape
    assert kph * 2 == kp and ip2 == 4 * iph, (gu_data.shape, d_data.shape, kp)
    ihalf = iph  # = I/2
    assert ihalf % bi == 0, (ihalf, bi)
    ni = ihalf // bi
    ioff = 2 * ihalf  # logical I = column offset of the up half

    in_specs = [
        pl.BlockSpec((mp, kp), lambda i: (0, 0)),
        pl.BlockSpec((1, kp), lambda i: (0, 0)),
        pl.BlockSpec((kph, bi), lambda i: (0, i)),                       # gate_a
        pl.BlockSpec((kph, bi), lambda i, ni=ni: (0, i + ni)),           # gate_b
        pl.BlockSpec((kph, bi), lambda i, ni=ni: (0, i + 2 * ni)),       # up_a
        pl.BlockSpec((kph, bi), lambda i, ni=ni: (0, i + 3 * ni)),       # up_b
        pl.BlockSpec((1, bi), lambda i: (0, i)),
        pl.BlockSpec((1, bi), lambda i, ni=ni: (0, i + ni)),
        pl.BlockSpec((1, bi), lambda i, ni=ni: (0, i + 2 * ni)),
        pl.BlockSpec((1, bi), lambda i, ni=ni: (0, i + 3 * ni)),
        pl.BlockSpec((bi, np_), lambda i: (i, 0)),                       # down
        pl.BlockSpec((1, np_), lambda i: (0, 0)),
    ]
    operands = [x, gamma, gu_data, gu_data, gu_data, gu_data,
                gu_scales, gu_scales, gu_scales, gu_scales, d_data, d_scales]
    if residual is not None:
        in_specs.append(pl.BlockSpec((mp, np_), lambda i: (0, 0)))
        operands.append(residual)

    out_m = mp if out_rows is None else out_rows
    kernel = functools.partial(
        _kernel_i4, ni, eps, 1.0 / logical_k, activation,
        residual is not None, x.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(ni,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_m, np_), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((out_m, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((mp, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)


def fused_mlp_ref(x, gamma, gu_int, gu_scales, d_int, d_scales, eps,
                  activation="silu", residual=None):
    """jnp oracle on logical int weights."""
    from eetq_tpu.ops.rmsnorm import rmsnorm

    y = rmsnorm(x, gamma, eps=eps)
    gu = (
        y.astype(jnp.float32) @ gu_int.astype(jnp.float32)
    ) * gu_scales.astype(jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = {"silu": jax.nn.silu, "gelu": jax.nn.gelu,
           "relu": jax.nn.relu}[activation]
    h = (act(gate) * up).astype(x.dtype)
    out = (
        h.astype(jnp.float32) @ d_int.astype(jnp.float32)
    ) * d_scales.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)
