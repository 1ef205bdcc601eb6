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
from typing import NamedTuple

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
    *refs,
    scale: float,
    causal: bool,
    window: int | None,
    kv_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    alibi: bool,
    delta: int,
):
    # delta = kv_len - sq aligns the LAST query with the LAST key: query
    # local row i sits at absolute position i + delta (cache-append /
    # chunked-prefill semantics; 0 for plain self-attention).
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    slopes_ref = refs.pop(0) if alibi else None  # [1, Hq] in SMEM
    o_ref, m_ref, l_ref, acc_ref = refs

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    # read at trace top level: program_id inside a pl.when closure doesn't
    # lower in interpret mode
    slope = slopes_ref[0, pl.program_id(1)] if alibi else None

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q + delta  # absolute position of the block's row 0
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
    if alibi:
        interior = False  # every tile adds the position bias

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
        if alibi:
            s = s + slope * (col - row).astype(jnp.float32)
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
    slopes: jax.Array | None = None,
) -> jax.Array:
    """q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D] with Hq % Hkv == 0.

    slopes [Hq] f32 enables ALiBi: score += slope_h * (key_pos - query_pos)
    (baichuan-13b). The slopes ride in SMEM and every tile adds the bias
    (the interior fast path is disabled — the bias needs the iotas anyway).
    Slopes are FROZEN under differentiation: ALiBi slopes are fixed
    model constants (never trained), so the VJP returns a zero cotangent
    for them rather than the exact gradient — `jax.grad` w.r.t. `slopes`
    yields zeros by design, unlike q/k/v which get exact flash-2 grads.

    DIFFERENTIABLE: a custom VJP implements the recompute-based flash-2
    backward (no S x S materialization), so LoRA finetuning over frozen
    quantized weights runs with flash memory behavior (the reference
    composes its dequantizing linear backward with flash-attn's CUDA
    backward, `modules/llama_modules.py:132-141` + `qlinear.py:64-94`).

    Returns [B, Sq, Hq, D] in q.dtype. Sequence dims are padded internally.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    statics = _Statics(causal, window, scale, block_q, block_kv, interpret)
    if slopes is None:
        return _flash_vjp_noalibi(statics, q, k, v)
    return _flash_vjp(statics, q, k, v, slopes)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    slopes: jax.Array | None,
    causal: bool,
    window: int | None,
    scale: float | None,
    block_q: int,
    block_kv: int,
    interpret: bool,
) -> jax.Array:
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
    alibi = slopes is not None
    kernel = functools.partial(
        _fa_kernel,
        scale=scale,
        causal=causal,
        window=window,
        kv_len=skv,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=nkv,
        alibi=alibi,
        delta=skv - sq,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec(
            (1, 1, block_kv, d), lambda b, h, i, j: (b, h // group, j, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d), lambda b, h, i, j: (b, h // group, j, 0)
        ),
    ]
    operands = [qt, kt, vt]
    if alibi:
        in_specs.append(
            pl.BlockSpec(
                (1, hq), lambda b, h, i, j: (0, 0), memory_space=pltpu.SMEM
            )
        )
        operands.append(slopes.astype(jnp.float32).reshape(1, hq))
    out = pl.pallas_call(
        kernel,
        grid=(b, hq, nq, nkv),
        in_specs=in_specs,
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
    )(*operands)
    return out[:, :, :sq, :].transpose(0, 2, 1, 3)


# ---- backward: recompute-based flash-2 VJP ----
#
# Chunked over the KV axis so no [Sq, Skv] score matrix is ever materialized
# (peak extra memory is one [B, Hq, Sq, chunk] block). Expressed as an XLA
# lax.scan rather than a hand-written Pallas kernel: the per-chunk einsums
# are large MXU matmuls and XLA pipelines the scan body; training is not the
# serving hot path, so compiler-scheduled recompute is the right
# cost/complexity point (the forward stays Pallas).


class _Statics(NamedTuple):
    causal: bool
    window: int | None
    scale: float
    block_q: int
    block_kv: int
    interpret: bool


BWD_CHUNK = 256


def _bwd_chunked(q, k, v, slopes, out, do, causal, window, scale):
    """Flash-2 backward math. q/out/do [B,Sq,Hq,D]; k/v [B,Skv,Hkv,D].
    Returns (dq, dk, dv) in the input dtypes."""
    b, sq, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    delta = skv - sq  # query i aligns with key i + delta

    c = min(BWD_CHUNK, skv)
    skv_p = -(-skv // c) * c
    nc = skv_p // c

    # head-major f32, scale folded into q (so dk needs no extra scale)
    qg = (q.transpose(0, 2, 1, 3).astype(jnp.float32) * scale).reshape(
        b, hkv, g, sq, d
    )
    dog = do.transpose(0, 2, 1, 3).astype(jnp.float32).reshape(b, hkv, g, sq, d)
    kc = (
        jnp.pad(k.transpose(0, 2, 1, 3).astype(jnp.float32),
                ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        .reshape(b, hkv, nc, c, d)
        .transpose(2, 0, 1, 3, 4)
    )  # [nc, B, Hkv, c, D]
    vc = (
        jnp.pad(v.transpose(0, 2, 1, 3).astype(jnp.float32),
                ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        .reshape(b, hkv, nc, c, d)
        .transpose(2, 0, 1, 3, 4)
    )
    row = jnp.arange(sq, dtype=jnp.int32)[:, None] + delta  # key-aligned
    if slopes is not None:
        sl = slopes.astype(jnp.float32).reshape(1, hkv, g, 1, 1)

    def scores(k_chunk, ci):
        col = jnp.arange(c, dtype=jnp.int32)[None, :] + ci * c
        s = jnp.einsum(
            "bkgqd,bkcd->bkgqc", qg, k_chunk,
            preferred_element_type=jnp.float32,
        )
        if slopes is not None:
            s = s + sl * (col - row).astype(jnp.float32)
        mask = col < skv
        if causal:
            mask &= col <= row
        if window is not None:
            mask &= col > row - window
        return jnp.where(mask, s, MASK_VALUE)

    # pass 1: logsumexp per query row (cheap: no V product)
    def lse_step(carry, xs):
        m, l = carry
        k_chunk, ci = xs
        s = scores(k_chunk, ci)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[..., None]), axis=-1
        )
        return (m_new, l), None

    m0 = jnp.full((b, hkv, g, sq), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, sq), jnp.float32)
    (m, l), _ = jax.lax.scan(
        lse_step, (m0, l0), (kc, jnp.arange(nc, dtype=jnp.int32))
    )
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))

    # pass 2: dq accumulation + per-chunk dk/dv
    dsum = jnp.sum(dog * out.transpose(0, 2, 1, 3).astype(jnp.float32)
                   .reshape(b, hkv, g, sq, d), axis=-1)  # [B,Hkv,g,Sq]

    def grad_step(dq_acc, xs):
        k_chunk, v_chunk, ci = xs
        p = jnp.exp(scores(k_chunk, ci) - lse[..., None])  # masked -> 0
        dv_c = jnp.einsum("bkgqc,bkgqd->bkcd", p, dog,
                          preferred_element_type=jnp.float32)
        dp = jnp.einsum("bkgqd,bkcd->bkgqc", dog, v_chunk,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - dsum[..., None])
        dq_acc = dq_acc + jnp.einsum(
            "bkgqc,bkcd->bkgqd", ds, k_chunk,
            preferred_element_type=jnp.float32,
        )
        dk_c = jnp.einsum("bkgqc,bkgqd->bkcd", ds, qg,
                          preferred_element_type=jnp.float32)
        return dq_acc, (dk_c, dv_c)

    dq0 = jnp.zeros((b, hkv, g, sq, d), jnp.float32)
    dq, (dk_chunks, dv_chunks) = jax.lax.scan(
        grad_step, dq0, (kc, vc, jnp.arange(nc, dtype=jnp.int32))
    )
    dq = (dq * scale).reshape(b, hq, sq, d).transpose(0, 2, 1, 3)
    dk = (
        dk_chunks.transpose(1, 2, 0, 3, 4).reshape(b, hkv, skv_p, d)[:, :, :skv]
    ).transpose(0, 2, 1, 3)
    dv = (
        dv_chunks.transpose(1, 2, 0, 3, 4).reshape(b, hkv, skv_p, d)[:, :, :skv]
    ).transpose(0, 2, 1, 3)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_vjp(statics, q, k, v, slopes):
    return _flash_forward(q, k, v, slopes, *statics)


def _flash_vjp_fwd(statics, q, k, v, slopes):
    out = _flash_forward(q, k, v, slopes, *statics)
    return out, (q, k, v, slopes, out)


def _flash_vjp_bwd(statics, res, do):
    q, k, v, slopes, out = res
    causal, window, scale, _, _, _ = statics
    dq, dk, dv = _bwd_chunked(q, k, v, slopes, out, do, causal, window, scale)
    # slopes are frozen model constants (see flash_attention docstring):
    # zero cotangent by design, not the exact gradient
    return dq, dk, dv, jnp.zeros_like(slopes)


_flash_vjp.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_vjp_noalibi(statics, q, k, v):
    return _flash_forward(q, k, v, None, *statics)


def _flash_vjp_noalibi_fwd(statics, q, k, v):
    out = _flash_forward(q, k, v, None, *statics)
    return out, (q, k, v, out)


def _flash_vjp_noalibi_bwd(statics, res, do):
    q, k, v, out = res
    causal, window, scale, _, _, _ = statics
    dq, dk, dv = _bwd_chunked(q, k, v, None, out, do, causal, window, scale)
    return dq, dk, dv


_flash_vjp_noalibi.defvjp(_flash_vjp_noalibi_fwd, _flash_vjp_noalibi_bwd)
