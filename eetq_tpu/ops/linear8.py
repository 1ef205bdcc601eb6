"""`w8a8_matmul` — full-int8 matmul with dynamic per-token activation
quantization (the live version of the reference's unused W8A8 epilogue
infrastructure, SURVEY.md §2.2 epilogue extensions row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eetq_tpu.kernels.autotune import MatmulConfig, choose_config
from eetq_tpu.kernels.w8a16 import Epilogue
from eetq_tpu.kernels.w8a8 import (
    quantize_activations,
    w8a8_matmul_kernel_call,
    w8a8_matmul_ref,
)
from eetq_tpu.layout import PackedWeight, pack_weights


def w8a8_matmul(
    x: jax.Array,
    qweight: PackedWeight | jax.Array,
    scales: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = None,
    config: MatmulConfig | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
) -> jax.Array:
    """out = act((int8(x) @ int8 W) * row_scale * col_scale + bias).

    x: [..., K] float; qweight int8 [K, N] (per-channel scales only —
    group-wise and int4 stay on the W8A16 path). Compute-bound regime
    (prefill): s8xs8 MXU at 2x bf16 throughput.
    """
    if not isinstance(qweight, PackedWeight):
        qweight = pack_weights(qweight)
    if qweight.bits != 8 or scales.ndim != 1:
        raise ValueError("w8a8_matmul needs int8 weights with per-channel scales")
    k, n = qweight.k, qweight.n
    *lead, xk = x.shape
    if xk != k:
        raise ValueError(f"x feature dim {xk} != weight K {k}")
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not use_kernel:
        from eetq_tpu.layout import unpack_weights

        return w8a8_matmul_ref(
            x.reshape(m, k), unpack_weights(qweight), scales, bias, activation
        ).reshape(*lead, n)

    kp, np_ = qweight.data.shape
    if config is None:
        config = choose_config(m, kp, np_)
    xq, sx = quantize_activations(x.reshape(m, k))
    mp = -(-m // config.bm) * config.bm
    xq_p = jnp.pad(xq, ((0, mp - m), (0, kp - k)))
    sx_p = jnp.pad(sx, (0, mp - m)).reshape(mp, 1)
    scales_p = jnp.pad(scales.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
    bias_p = None if bias is None else jnp.pad(bias, (0, np_ - n))
    epilogue = Epilogue(has_bias=bias is not None, activation=activation)
    out = w8a8_matmul_kernel_call(
        xq_p, qweight.data, sx_p, scales_p, bias_p, None, config, epilogue,
        out_dtype=x.dtype, interpret=interpret,
    )
    if out.shape[0] != m:
        out = out[:m]
    if n != np_:
        out = out[:, :n]
    return out.reshape(*lead, n)
