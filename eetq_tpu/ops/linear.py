"""`w8a16_matmul` — the single user-facing quantized matmul entry.

Mirrors `w8_a16_gemm_forward_cuda` (`csrc/cutlass_kernels/
fpA_intB_gemm_wrapper.cu:130-173`): flatten leading dims to m x k, then
dispatch on m between the decode-GEMV regime (m <= MAX_DECODE_M, reference
m <= 4) and the prefill tiled-GEMM regime — here both are one Pallas kernel
with different autotuned block configs. Unlike the reference (which re-runs
its occupancy heuristic every call), the config choice is cached per shape
and jit caches the compiled kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eetq_tpu.kernels.autotune import MatmulConfig, choose_config
from eetq_tpu.kernels.w8a16 import Epilogue, w8a16_matmul_kernel_call, w8a16_matmul_ref
from eetq_tpu.layout import PackedWeight, pack_weights


def _default_interpret() -> bool:
    # Pallas TPU kernels run interpreted on CPU (tests, debugging); compiled
    # on real TPU. The reference's analogue is interpret-mode = its unit
    # "sanitizer" (SURVEY.md §5).
    return jax.default_backend() != "tpu"


def _ref_forward(x2, qdata, k, n, scales, bias, residual, activation, residual_mode):
    """jnp dequant-matmul path on the packed (padded) weight buffer."""
    return w8a16_matmul_ref(
        x2,
        qdata[:k, :n],
        scales[:n],
        bias=bias,
        activation=activation,
        residual=residual,
        residual_mode=residual_mode,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _w8a16_matmul_core(
    x2, qdata, scales, bias, residual,
    k, n, activation, residual_mode, config, interpret, use_kernel,
):
    if not use_kernel:
        return _ref_forward(
            x2, qdata, k, n, scales, bias, residual, activation, residual_mode
        )
    m = x2.shape[0]
    kp, np_ = qdata.shape
    mp = -(-m // config.bm) * config.bm
    # Zero-padding is exact: padded x columns multiply padded (zero) weight
    # rows, and padded output rows/cols are sliced off.
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
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
    out = w8a16_matmul_kernel_call(
        xp, qdata, scales_p, bias_p, res_p, config, epilogue, interpret
    )
    return out[:m, :n]


def _core_fwd(x2, qdata, scales, bias, residual, *statics):
    out = _w8a16_matmul_core(x2, qdata, scales, bias, residual, *statics)
    return out, (x2, qdata, scales, bias, residual)


def _core_bwd(k, n, activation, residual_mode, config, interpret, use_kernel,
              saved, g):
    """Backward for LoRA-over-frozen-quantized training (the reference's
    hand-written `EetqLinearMMFunction.backward`, qlinear.py:64-94, which
    dequantizes W and computes grad_input). Here we differentiate the jnp
    dequant-matmul reference path — exact, and XLA fuses the dequant into
    the transposed matmul. int8 qweight gets a float0 cotangent (frozen)."""
    x2, qdata, scales, bias, residual = saved
    _, vjp = jax.vjp(
        lambda xx, qq, ss, bb, rr: _ref_forward(
            xx, qq, k, n, ss, bb, rr, activation, residual_mode
        ),
        x2, qdata, scales, bias, residual,
    )
    return vjp(g)


_w8a16_matmul_core.defvjp(_core_fwd, _core_bwd)


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
) -> jax.Array:
    """out = act(x @ (qweight * scales) + bias) [+|*] residual.

    Args:
      x: [..., K] float (bf16 recommended).
      qweight: PackedWeight (preferred; pack once offline) or raw int8 [K, N]
        (packed on the fly — convenient but repads per call).
      scales: [N] per-output-channel scales.
      bias: optional [N].
      activation: None | "relu" | "gelu" | "silu" (fused epilogue).
      residual: optional [..., N] fused residual; residual_mode "add"|"mul".
      config: override the autotuned block config.
      interpret: force Pallas interpret mode (defaults to True off-TPU).
      use_kernel: False -> pure-jnp reference path (testing).
    """
    if not isinstance(qweight, PackedWeight):
        qweight = pack_weights(qweight)
    k, n = qweight.k, qweight.n
    *lead, xk = x.shape
    if xk != k:
        raise ValueError(f"x feature dim {xk} != weight K {k}")
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    res2 = None if residual is None else residual.reshape(m, n)

    if config is None:
        config = choose_config(m, qweight.kp, qweight.np)
    if interpret is None:
        interpret = _default_interpret()

    out = _w8a16_matmul_core(
        x2, qweight.data, scales, bias, res2,
        k, n, activation, residual_mode, config, interpret, use_kernel,
    )
    return out.reshape(*lead, n)
