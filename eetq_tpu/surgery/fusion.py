"""QKV / gate-up fusion and exact splitting of quantized linears.

The reference fuses q/k/v (and gate/up) so they share one per-column-scaled
quantized GEMM, then slices the quantized weight + scales back along N after
quantization (`utils/base.py:40-129`, `models/llama.py:39-89`). Because
scales are per output channel, slicing along N is scale-exact — the
invariant property-tested in tests/test_surgery.py (SURVEY.md hard part #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eetq_tpu.layout import pack_weights, unpack_weights
from eetq_tpu.modules.linear import QuantLinear


def fuse_columns(weights: list[jax.Array]) -> jax.Array:
    """Concatenate [K, Ni] float weights along N (shared-K fusion)."""
    k = weights[0].shape[0]
    if any(w.shape[0] != k for w in weights):
        raise ValueError([w.shape for w in weights])
    return jnp.concatenate(weights, axis=-1)


def fuse_qkv(wq: jax.Array, wk: jax.Array, wv: jax.Array) -> jax.Array:
    """[K, Nq|Nk|Nv] fused qkv (reference fuse_qkv_gateup,
    models/llama.py:39-62)."""
    return fuse_columns([wq, wk, wv])


def fuse_gateup(w_gate: jax.Array, w_up: jax.Array) -> jax.Array:
    return fuse_columns([w_gate, w_up])


def split_quant_columns(ql: QuantLinear, sizes: list[int]) -> list[QuantLinear]:
    """Split a quantized fused linear back into per-projection QuantLinears
    by slicing qweight + scales along N — bit-exact (per-column scales).

    The inverse of fusing before quantization; the reference's
    replace_split_qkv / replace_split_gateup (`utils/base.py:67-129`).
    """
    if sum(sizes) != ql.out_features:
        raise ValueError(f"sizes {sizes} != out_features {ql.out_features}")
    q = unpack_weights(ql.qweight)
    bits = ql.qweight.bits
    outs = []
    start = 0
    for n in sizes:
        sl = slice(start, start + n)
        outs.append(
            QuantLinear(
                # scales sliced on the channel axis: exact for per-channel
                # [N] and group-wise [G, N] alike
                qweight=pack_weights(q[:, sl], bits=bits),
                scales=ql.scales[..., sl],
                bias=None if ql.bias is None else ql.bias[sl],
            )
        )
        start += n
    return outs
