"""`fused_mlp` — the whole gated-MLP block (RMSNorm + gate/up GEMV +
swiglu + down GEMV + optional residual) as one kernel dispatch, for the
decode regime. See kernels/mlp_fused.py for the grid design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eetq_tpu.kernels.mlp_fused import (
    fused_mlp_gemv_call,
    fused_mlp_gemv_i4_call,
    fused_mlp_ref,
)
from eetq_tpu.modules.linear import QuantLinear


def _pick_bi(rows: int, bits: int) -> int | None:
    """Largest lane-aligned divisor of the grid dimension (packed down
    rows: I for int8, I/2 for int4), capped so VMEM blocks stay ~1-2 MB.
    chatglm3's I=13696 (= 128*107) gets bi=128; llama/mistral get 256."""
    cap = 128 if bits == 4 else 256
    for cand in range(cap, 127, -128):
        if rows % cand == 0:
            return cand
    return None


def can_fuse_mlp(gateup, down, m: int) -> bool:
    """Fused path preconditions: decode-regime rows, per-channel int8 OR
    int4 on both projections (same bits), no bias, and tile-aligned
    intermediate dim — the gate|up halves of the packed [K, 2I] buffer
    must sit at exact column I, which holds when I is a multiple of the
    256-column tile (true for every llama/mistral/gemma/qwen/chatglm
    preset). int4 additionally needs the split-half row blocks to divide
    I/2."""
    if m > 8:
        return False
    for lin in (gateup, down):
        if not isinstance(lin, QuantLinear):
            return False
        if lin.qweight.bits not in (4, 8) or lin.scales.ndim != 1:
            return False
        if lin.bias is not None:
            return False
    bits = down.qweight.bits
    if gateup.qweight.bits != bits:
        return False
    i = down.qweight.k
    if not (
        gateup.qweight.n == 2 * i
        and gateup.qweight.data.shape[1] == 2 * i  # no N padding inside
    ):
        return False
    rows = i // 2 if bits == 4 else i
    if down.qweight.data.shape[0] != rows:
        return False
    return _pick_bi(rows, bits) is not None


def fused_mlp(
    gateup: QuantLinear,
    down: QuantLinear,
    x: jax.Array,          # [..., K]
    gamma: jax.Array,      # [K] rmsnorm weight (already unit-offset if any)
    eps: float,
    activation: str = "silu",
    residual: jax.Array | None = None,  # [..., N] fused add
    bi: int | None = None,
    interpret: bool | None = None,
    use_kernel: bool = True,
) -> jax.Array:
    """out = act(rmsnorm(x) @ Wg) * (rmsnorm(x) @ Wu) @ Wd (+ residual)."""
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    n = down.qweight.n
    bits = down.qweight.bits
    if bi is None:
        rows = down.qweight.data.shape[0]
        bi = _pick_bi(rows, bits)
        if bi is None:
            raise ValueError(
                f"no lane-aligned block divides the {rows} packed down "
                "rows — gate with can_fuse_mlp()"
            )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not use_kernel:
        from eetq_tpu.layout import unpack_weights

        gu_int = unpack_weights(gateup.qweight)
        d_int = unpack_weights(down.qweight)
        out = fused_mlp_ref(
            x.reshape(m, k), gamma.reshape(1, k), gu_int, gateup.scales,
            d_int, down.scales, eps, activation,
            None if residual is None else residual.reshape(m, n),
        )
        return out.reshape(*lead, n)

    kp = gateup.qweight.data.shape[0] * (2 if bits == 4 else 1)
    np_ = down.qweight.data.shape[1]
    ip = down.qweight.data.shape[0]  # packed rows: I (int8) or I/2 (int4)
    mp = 8
    xp = jnp.pad(x.reshape(m, k), ((0, mp - m), (0, kp - k)))
    gamma_p = jnp.pad(gamma.astype(jnp.float32), (0, kp - k)).reshape(1, kp)
    gu_s = gateup.scales.astype(jnp.float32).reshape(1, gateup.qweight.n)
    d_s = jnp.pad(
        down.scales.astype(jnp.float32), (0, np_ - n)
    ).reshape(1, np_)
    res_p = None
    if residual is not None:
        res_p = jnp.pad(residual.reshape(m, n), ((0, mp - m), (0, np_ - n)))
    call = fused_mlp_gemv_i4_call if bits == 4 else fused_mlp_gemv_call
    out = call(
        xp, gamma_p, gateup.qweight.data, gu_s, down.qweight.data, d_s,
        res_p, eps=eps, logical_k=k, activation=activation, bi=bi,
        interpret=interpret, out_rows=m,
    )
    if n != np_:
        out = out[:, :n]
    return out.reshape(*lead, n)
