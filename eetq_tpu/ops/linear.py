"""`w8a16_matmul` — the single user-facing quantized matmul entry.

Mirrors `w8_a16_gemm_forward_cuda` (`csrc/cutlass_kernels/
fpA_intB_gemm_wrapper.cu:130-173`): flatten leading dims to m x k, then
dispatch on m between the decode-GEMV regime (m <= MAX_DECODE_M, reference
m <= 4) and the prefill tiled-GEMM regime — here both are one Pallas kernel
with different autotuned block configs. Unlike the reference (which re-runs
its occupancy heuristic every call), the config choice is cached per shape
and jit caches the compiled kernel.

Supports int8 and int4 weights (the reference's Int8b/Int4b GEMV kernels),
per-channel [N] or group-wise [K/g, N] scales (PerChannel / GroupWise
quant modes, `weightOnlyBatchedGemv/common.h:73-79`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eetq_tpu.kernels.autotune import MatmulConfig, choose_config
from eetq_tpu.kernels.w8a16 import Epilogue, w8a16_matmul_kernel_call, w8a16_matmul_ref
from eetq_tpu.layout import PackedWeight, pack_weights, unpack_weights


def _default_interpret() -> bool:
    # Pallas TPU kernels run interpreted on CPU (tests, debugging); compiled
    # on real TPU. The reference's analogue is interpret-mode = its unit
    # "sanitizer" (SURVEY.md §5).
    return jax.default_backend() != "tpu"


def _ref_forward(x2, qw_logical, k, n, scales, bias, residual, activation,
                 residual_mode):
    """jnp dequant-matmul oracle on the logical weight."""
    return w8a16_matmul_ref(
        x2,
        qw_logical,
        scales,
        bias=bias,
        activation=activation,
        residual=residual,
        residual_mode=residual_mode,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _w8a16_matmul_core(
    x2, qdata, scales, bias, residual,
    k, n, bits, activation, residual_mode, config, interpret, use_kernel,
):
    """qdata: PackedWeight.data (padded, int4 nibble-packed); scales are
    LOGICAL ([N] or [K/g, N])."""
    if not use_kernel:
        qw = unpack_weights(PackedWeight(data=qdata, k=k, n=n, bits=bits))
        return _ref_forward(
            x2, qw, k, n, scales, bias, residual, activation, residual_mode
        )
    m = x2.shape[0]
    kp = qdata.shape[0] * (2 if bits == 4 else 1)
    np_ = qdata.shape[1]
    mp = -(-m // config.bm) * config.bm
    # Zero-padding is exact: padded x columns multiply padded (zero) weight
    # rows, and padded output rows/cols are sliced off.
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    if scales.ndim == 1:
        scales_p = jnp.pad(scales, (0, np_ - n)).astype(jnp.float32)
    else:
        gcount = scales.shape[0]
        g = k // gcount
        gp = kp // g  # padded group rows (zero weight rows -> any scale)
        scales_p = jnp.pad(
            scales.astype(jnp.float32), ((0, gp - gcount), (0, np_ - n))
        )
    bias_p = None if bias is None else jnp.pad(bias, (0, np_ - n))
    res_p = None
    if residual is not None:
        res_p = jnp.pad(residual, ((0, mp - m), (0, np_ - n)))
    epilogue = Epilogue(
        has_bias=bias is not None,
        activation=activation,
        residual=None if residual is None else residual_mode,
    )
    # Emit exactly m rows when the grid has a single row-block (decode):
    # slicing a Pallas output in XLA materializes a real copy per call.
    emit_rows = m if (mp != m and mp == config.bm) else None
    out = w8a16_matmul_kernel_call(
        xp, qdata, scales_p, bias_p, res_p, config, epilogue, interpret,
        bits=bits, out_rows=emit_rows,
    )
    if out.shape[0] != m:
        out = out[:m]
    if n != np_:
        out = out[:, :n]
    return out


def _core_fwd(x2, qdata, scales, bias, residual, *statics):
    out = _w8a16_matmul_core(x2, qdata, scales, bias, residual, *statics)
    return out, (x2, qdata, scales, bias, residual)


def _core_bwd(k, n, bits, activation, residual_mode, config, interpret,
              use_kernel, saved, g):
    """Backward for LoRA-over-frozen-quantized training (the reference's
    hand-written `EetqLinearMMFunction.backward`, qlinear.py:64-94, which
    dequantizes W and computes grad_input). Here we differentiate the jnp
    dequant-matmul reference path — exact, and XLA fuses the dequant into
    the transposed matmul. int8 qweight gets a float0 cotangent (frozen)."""
    x2, qdata, scales, bias, residual = saved
    _, vjp = jax.vjp(
        lambda xx, qq, ss, bb, rr: _ref_forward(
            xx,
            unpack_weights(PackedWeight(data=qq, k=k, n=n, bits=bits)),
            k, n, ss, bb, rr, activation, residual_mode,
        ),
        x2, qdata, scales, bias, residual,
    )
    # int8 qdata gets a float0 cotangent automatically (frozen weights)
    return vjp(g)


_w8a16_matmul_core.defvjp(_core_fwd, _core_bwd)


def _compatible_config(
    config: MatmulConfig, kp_data: int, group_size: int | None, bits: int
) -> MatmulConfig:
    """Shrink bk if needed so the group constraint holds (bk % g == 0 or
    g % bk == 0; int4 requires bk % g == 0)."""
    g = group_size
    if g is None:
        return config
    # bk counts packed weight rows; for int4 each half-block covers bk
    # LOGICAL rows, so the group constraint is in logical units either way.
    bk = config.bk
    if bk % g == 0 or (bits != 4 and g % bk == 0):
        return config
    # largest multiple of g that divides kp_data and is <= bk
    cand = (bk // g) * g
    while cand >= g:
        if kp_data % cand == 0:
            return MatmulConfig(bm=config.bm, bn=config.bn, bk=cand)
        cand -= g
    return MatmulConfig(bm=config.bm, bn=config.bn, bk=g)


def w8a16_matmul(
    x: jax.Array,
    qweight: PackedWeight | jax.Array,
    scales: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = None,
    residual: jax.Array | None = None,
    residual_mode: str = "add",
    config: MatmulConfig | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
    bits: int = 8,
    prenorm_gamma: jax.Array | None = None,
    prenorm_eps: float = 1e-6,
) -> jax.Array:
    """out = act(x @ dequant(qweight, scales) + bias) [+|*] residual.

    Args:
      x: [..., K] float (bf16 recommended).
      qweight: PackedWeight (preferred; pack once offline) or raw int8 [K, N]
        one-value-per-int8 (packed on the fly — convenient but repads per
        call; pass `bits=4` for int4 values).
      scales: [N] per-output-channel or [K/g, N] group-wise scales.
      bias: optional [N].
      activation: None | "relu" | "gelu" | "silu" (fused epilogue).
      residual: optional [..., N] fused residual; residual_mode "add"|"mul".
      config: override the autotuned block config.
      interpret: force Pallas interpret mode (defaults to True off-TPU).
      use_kernel: False -> pure-jnp reference path (testing).
      bits: weight bit-width when passing a raw int8 array (ignored for
        PackedWeight, which knows its own).
      prenorm_gamma: optional [K] RMSNorm gain — fuses
        ``rmsnorm(x, gamma, prenorm_eps)`` into the kernel prologue when
        the chosen config has whole-K int8 per-channel blocks (the decode
        regime); otherwise the norm is applied as a jnp op first.
        Differentiable (the fused path's VJP runs the rmsnorm->matmul
        reference composition).
    """
    if not isinstance(qweight, PackedWeight):
        qweight = pack_weights(qweight, bits=bits)
    bits = qweight.bits
    k, n = qweight.k, qweight.n
    *lead, xk = x.shape
    if xk != k:
        raise ValueError(f"x feature dim {xk} != weight K {k}")
    group_size = None
    if scales.ndim == 2:
        if k % scales.shape[0]:
            raise ValueError(
                f"scale rows {scales.shape[0]} must divide K {k}"
            )
        group_size = k // scales.shape[0]
        if qweight.kp % group_size:
            raise ValueError(
                f"group size {group_size} must divide padded K {qweight.kp} "
                f"(pad K to a group multiple before packing)"
            )
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    res2 = None if residual is None else residual.reshape(m, n)

    if config is None:
        config = choose_config(m, qweight.data.shape[-2], qweight.np, bits)
    config = _compatible_config(
        config, qweight.data.shape[-2], group_size, bits
    )
    if interpret is None:
        interpret = _default_interpret()

    if prenorm_gamma is not None:
        kp_data, np_ = qweight.data.shape
        fusible = (
            use_kernel
            and bits == 8
            and group_size is None
            and config.bk == kp_data
        )
        if fusible:
            return _w8a16_prenorm_call(
                x2, qweight.data, scales, bias, res2, prenorm_gamma,
                k, n, activation, residual_mode, config, interpret,
                prenorm_eps,
            ).reshape(*lead, n)
        from eetq_tpu.ops.rmsnorm import rmsnorm

        x2 = rmsnorm(x2, prenorm_gamma, eps=prenorm_eps)

    out = _w8a16_matmul_core(
        x2, qweight.data, scales, bias, res2,
        k, n, bits, activation, residual_mode, config, interpret, use_kernel,
    )
    return out.reshape(*lead, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _w8a16_prenorm_call(
    x2, qdata, scales, bias, residual, gamma,
    k, n, activation, residual_mode, config, interpret, eps,
):
    """Kernel path with the RMSNorm prologue fused. Forward runs the fused
    Pallas kernel; the VJP differentiates the rmsnorm -> dequant-matmul
    reference composition (exact; frozen int8 weights get float0)."""
    m = x2.shape[0]
    kp, np_ = qdata.shape
    mp = -(-m // config.bm) * config.bm
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    gamma_p = jnp.pad(gamma.astype(jnp.float32), (0, kp - k))
    scales_p = jnp.pad(scales, (0, np_ - n)).astype(jnp.float32)
    bias_p = None if bias is None else jnp.pad(bias, (0, np_ - n))
    res_p = None
    if residual is not None:
        res_p = jnp.pad(residual, ((0, mp - m), (0, np_ - n)))
    epilogue = Epilogue(
        has_bias=bias is not None,
        activation=activation,
        residual=None if residual is None else residual_mode,
    )
    emit_rows = m if (mp != m and mp == config.bm) else None
    out = w8a16_matmul_kernel_call(
        xp, qdata, scales_p, bias_p, res_p, config, epilogue, interpret,
        bits=8, out_rows=emit_rows,
        prenorm=(float(eps), 1.0 / float(k)), prenorm_gamma=gamma_p,
    )
    if out.shape[0] != m:
        out = out[:m]
    if n != np_:
        out = out[:, :n]
    return out


def _prenorm_fwd(x2, qdata, scales, bias, residual, gamma, *statics):
    out = _w8a16_prenorm_call(x2, qdata, scales, bias, residual, gamma, *statics)
    return out, (x2, qdata, scales, bias, residual, gamma)


def _prenorm_bwd(k, n, activation, residual_mode, config, interpret, eps,
                 saved, g):
    from eetq_tpu.ops.rmsnorm import rmsnorm

    x2, qdata, scales, bias, residual, gamma = saved
    _, vjp = jax.vjp(
        lambda xx, qq, ss, bb, rr, gg: _ref_forward(
            rmsnorm(xx, gg, eps=eps),
            unpack_weights(PackedWeight(data=qq, k=k, n=n, bits=8)),
            k, n, ss, bb, rr, activation, residual_mode,
        ),
        x2, qdata, scales, bias, residual, gamma,
    )
    return vjp(g)


_w8a16_prenorm_call.defvjp(_prenorm_fwd, _prenorm_bwd)
