"""Flash-attention-2 forward Pallas kernel (causal, GQA, sliding window).

Replaces the reference's dependency on the external flash-attn CUDA package
(`python/eetq/modules/llama_modules.py:9-16,132-141`) with a TPU-native
kernel: online softmax over KV tiles, f32 statistics, causal tile skipping,
GQA head mapping done in the BlockSpec index map (kv head = q head // group)
so no K/V replication is materialized.

Layout: [B, H, S, D] blocks of (1, 1, block_q, D) / (1, 1, block_kv, D);
grid (B, Hq, Sq/bq, Skv/bkv) with the KV dimension innermost ("arbitrary" —
it carries the online-softmax recurrence in VMEM scratch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * f32max, not -inf: exp(-inf - (-inf)) would NaN.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# v5e-measured (scripts + /tmp sweeps, S=1024 H=32 D=128 causal):
# 512/512 -> 148us vs 256/256 -> 315us (VPU bookkeeping amortizes with area)
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_KV = 512


def _fa_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    causal: bool,
    window: int | None,
    kv_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q
    kv_start = ki * block_kv

    should_run = kv_start < kv_len
    if causal:
        # Skip KV tiles entirely above the diagonal.
        should_run &= q_start + block_q - 1 >= kv_start
    if window is not None:
        # Skip KV tiles entirely left of every query's window.
        should_run &= kv_start + block_kv - 1 >= q_start - window + 1

    # Interior tiles need NO mask at all: fully real keys and (for causal)
    # fully below the diagonal. Only diagonal/edge tiles pay for the iota +
    # compare + select VPU work — the kernel's dominant cost otherwise.
    interior = kv_start + block_kv <= kv_len
    if causal:
        interior &= kv_start + block_kv - 1 <= q_start
    if window is not None:
        interior = False  # every tile needs the left-edge mask

    def _accumulate(s):
        m_prev = m_ref[:]  # [bq, 128] (value broadcast over lanes)
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> [bq, 128]
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # [bq, 1]
        p = jnp.exp(s - m_next[:, :1])  # [bq, bkv]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_next
        v = v_ref[0, 0]  # [bkv, D]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    def _scores():
        # scale folded into q: one [bq, D] multiply instead of [bq, bkv]
        q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0, 0]  # [bkv, D]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(should_run & interior)
    def _run_interior():
        _accumulate(_scores())

    @pl.when(should_run & jnp.logical_not(interior))
    def _run_masked():
        s = _scores()
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + q_start
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + kv_start
        mask = col < kv_len  # padded keys
        if causal:
            mask &= col <= row
        if window is not None:
            mask &= col > row - window
        _accumulate(jnp.where(mask, s, MASK_VALUE))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "window", "scale", "block_q", "block_kv", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    window: int | None = None,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: bool | None = None,
) -> jax.Array:
    """q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D] with Hq % Hkv == 0.

    Returns [B, Sq, Hq, D] in q.dtype. Sequence dims are padded internally.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)

    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_kv = min(block_kv, max(128, 1 << (skv - 1).bit_length()))
    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_kv) * block_kv

    # [B, H, S, D] layout: seq in sublanes, head_dim in lanes.
    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    nq = sq_p // block_q
    nkv = skv_p // block_kv
    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        causal=causal,
        window=window,
        kv_len=skv,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=nkv,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hq, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda b, h, i, j: (b, h // group, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda b, h, i, j: (b, h // group, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max m
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum l
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq_p * skv_p * d // (2 if causal else 1),
            bytes_accessed=(
                b * hq * sq_p * d * 2 * 2 + b * hkv * skv_p * d * 2 * 2
            ),
            transcendentals=b * hq * sq_p * skv_p,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out[:, :, :sq, :].transpose(0, 2, 1, 3)
