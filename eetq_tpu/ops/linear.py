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

    if not use_kernel:
        out = w8a16_matmul_ref(
            x2,
            qweight.data[:k, :n],
            scales[:n],
            bias=bias,
            activation=activation,
            residual=None if residual is None else residual.reshape(m, n),
            residual_mode=residual_mode,
        )
        return out.reshape(*lead, n)

    kp, np_ = qweight.kp, qweight.np
    if config is None:
        config = choose_config(m, kp, np_)
    if interpret is None:
        interpret = _default_interpret()

    # Pad operands to block multiples. Zero-padding is exact: padded x columns
    # multiply padded (zero) weight rows, and padded output rows/cols are
    # sliced off.
    mp = -(-m // config.bm) * config.bm
    xp = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    scales_p = jnp.pad(scales, (0, np_ - n)).astype(jnp.float32)
    bias_p = None if bias is None else jnp.pad(bias, (0, np_ - n))
    res_p = None
    if residual is not None:
        res_p = jnp.pad(residual.reshape(m, n), ((0, mp - m), (0, np_ - n)))

    epilogue = Epilogue(
        has_bias=bias is not None,
        activation=activation,
        residual=None if residual is None else residual_mode,
    )
    out = w8a16_matmul_kernel_call(
        xp, qweight.data, scales_p, bias_p, res_p, config, epilogue, interpret
    )
    return out[:m, :n].reshape(*lead, n)
