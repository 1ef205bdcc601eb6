"""Flash-decode Pallas kernel: single-token attention over the KV cache.

Replaces the XLA decode-attention einsums with one fused kernel over the
[B, Hkv, L, D] cache layout:

- grid (B, Hkv/bh, L/bl): bh kv heads are processed per grid step (bigger
  DMAs, fewer steps), the KV-block dimension is innermost and carries the
  online-softmax recurrence (flash-2 statistics in VMEM scratch, one row
  band per head);
- per-row lengths live in SMEM (scalar prefetch); blocks at or beyond a
  row's length CLAMP their index map to the last valid block — Pallas
  skips the DMA when the block index repeats, so only ceil(length/bl)
  blocks are ever fetched (a 2048-slot engine cache costs only its used
  prefix, unlike the XLA path which reads max_len every step);
- int8 KV caches dequantize in-register (per-token scales streamed as
  [B, Hkv, L, 1] views) — the full bandwidth win, unlike the XLA path
  which materializes the dequantized cache;
- GQA: each head computes its whole q group [G, D] against the block.

Wins when max_len >> current length (continuous-batching engines) or with
int8 KV; for tight caches on MHA models the batched XLA einsum still wins
(see modules/attention.attention_decode's default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

DEFAULT_BLOCK_L = 512


def _fd_kernel(
    nl: int,
    bl: int,
    bh: int,
    scale: float,
    window: int | None,
    quantized: bool,
    alibi: bool,
    # refs: lengths(SMEM), [table(SMEM)], q, k, v, [ks, vs],
    #       [slopes(SMEM)], out, m, l, acc
    *refs,
    paged: bool = False,
):
    refs = list(refs)
    len_ref = refs.pop(0)
    if paged:
        refs.pop(0)  # block table: consumed by the index maps only
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    ks_ref = vs_ref = None
    if quantized:
        ks_ref, vs_ref = refs[:2]
        refs = refs[2:]
    slopes_ref = refs.pop(0) if alibi else None  # [1, Hq] in SMEM
    out_ref, m_ref, l_ref, acc_ref = refs

    def kv(ref, t):
        # paged pool blocks carry a leading [1] pool axis
        return ref[0, 0, t] if paged else ref[0, t]

    b = pl.program_id(0)
    hi = pl.program_id(1)
    li = pl.program_id(2)
    length = len_ref[b]
    g = q_ref.shape[2]
    if alibi:
        # q head index of (kv head t, group row gg) = (hi*bh + t)*g + gg;
        # read at trace top level (program_id doesn't lower inside pl.when
        # closures in interpret mode)
        slopes_all = [
            [slopes_ref[0, (hi * bh + t) * g + gg] for gg in range(g)]
            for t in range(bh)
        ]

    @pl.when(li == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_start = li * bl
    should_run = block_start < length
    if window is not None:
        should_run &= block_start + bl - 1 >= length - window

    @pl.when(should_run)
    def _run():
        col = jax.lax.broadcasted_iota(jnp.int32, (g, bl), 1) + block_start
        mask = col < length
        if window is not None:
            mask &= col >= length - window
        for t in range(bh):  # unrolled over the head block
            q = (q_ref[0, t].astype(jnp.float32) * scale)  # [G, D]
            k = kv(k_ref, t)  # [bl, D]
            v = kv(v_ref, t)
            if quantized:
                k = k.astype(jnp.bfloat16) * kv(ks_ref, t).astype(jnp.bfloat16)
                v = v.astype(jnp.bfloat16) * kv(vs_ref, t).astype(jnp.bfloat16)
            q_ = q.astype(k.dtype)
            s = jax.lax.dot_general(
                q_, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, bl]
            if alibi:
                # the query sits at position length-1
                sl = jnp.stack(slopes_all[t])  # [G]
                s = s + sl[:, None] * (col - (length - 1)).astype(jnp.float32)
            s = jnp.where(mask, s, MASK_VALUE)

            r = slice(t * g, (t + 1) * g)  # this head's scratch row band
            m_prev = m_ref[r]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
            p = jnp.exp(s - m_next[:, :1])
            l_ref[r] = l_ref[r] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[r] = m_next
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            acc_ref[r] = acc_ref[r] * alpha + pv

    @pl.when(li == nl - 1)
    def _finalize():
        for t in range(bh):
            r = slice(t * g, (t + 1) * g)
            l = l_ref[r, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out_ref[0, t] = (acc_ref[r] * l_inv).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window", "scale", "block_h", "interpret"),
)
def paged_flash_decode(
    q: jax.Array,
    cache,
    lengths,
    window: int | None = None,
    scale: float | None = None,
    block_h: int | None = None,
    interpret: bool | None = None,
    slopes: jax.Array | None = None,
) -> jax.Array:
    """Flash decode over a PAGED cache (modules.paged.PagedKVCache).

    Same kernel body as flash_decode — the only difference is the KV index
    map: the block table is scalar-prefetched alongside the lengths, and
    logical L-block li of row b maps to PHYSICAL pool block
    table[b, min(li, last_valid)], so only the ceil(length/bs) blocks a row
    actually owns are ever DMA'd, wherever they sit in the pool. The
    L-block size is the pool's block_size (whole pool blocks)."""
    b, s, hq, d = q.shape
    assert s == 1, "paged_flash_decode is the single-token path"
    nb_pool, hkv, bs, _ = cache.k.shape
    group = hq // hkv
    nl = cache.table.shape[1]  # logical blocks per sequence
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if block_h is None:
        block_h = max(1, min(hkv, 32 // group, (512 * 1024) // (bs * d)))
    bh = block_h
    while hkv % bh:
        bh -= 1
    nh = hkv // bh

    lengths = jnp.broadcast_to(jnp.asarray(lengths, jnp.int32).reshape(-1), (b,))
    qg = q[:, 0].reshape(b, hkv, group, d)
    quantized = cache.quantized

    # pools have no batch dim; a leading [1] axis keeps the same per-block
    # layout as the dense kernel, with the POOL block chosen by the table
    def kv_map_pool(bb, h, li, lens, tbl):
        last = jnp.maximum(lens[bb] - 1, 0) // bs
        return 0, tbl[bb, jnp.minimum(li, last)], h, 0, 0

    in_specs = [
        pl.BlockSpec((1, bh, group, d),
                     lambda bb, h, li, lens, tbl: (bb, h, 0, 0)),
        pl.BlockSpec((1, 1, bh, bs, d), kv_map_pool),
        pl.BlockSpec((1, 1, bh, bs, d), kv_map_pool),
    ]
    operands = [qg, cache.k[None], cache.v[None]]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 1, bh, bs, 1), kv_map_pool))
        in_specs.append(pl.BlockSpec((1, 1, bh, bs, 1), kv_map_pool))
        operands.append(cache.k_scale[None].reshape(1, nb_pool, hkv, bs, 1))
        operands.append(cache.v_scale[None].reshape(1, nb_pool, hkv, bs, 1))
    alibi = slopes is not None
    if alibi:
        in_specs.append(
            pl.BlockSpec(
                (1, hq),
                lambda bb, h, li, lens, tbl: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        operands.append(slopes.astype(jnp.float32).reshape(1, hq))

    kernel = functools.partial(
        _fd_kernel, nl, bs, bh, scale, window, quantized, alibi, paged=True
    )
    srows = max(bh * group, 8)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nh, nl),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bh, group, d), lambda bb, h, li, lens, tbl: (bb, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((srows, 128), jnp.float32),
                pltpu.VMEM((srows, 128), jnp.float32),
                pltpu.VMEM((srows, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, cache.table, *operands)
    return out.reshape(b, 1, hq, d)


@functools.partial(
    jax.jit,
    static_argnames=("window", "scale", "block_l", "block_h", "interpret"),
)
def flash_decode(
    q: jax.Array,
    cache,
    length,
    window: int | None = None,
    scale: float | None = None,
    block_l: int = DEFAULT_BLOCK_L,
    block_h: int | None = None,
    interpret: bool | None = None,
    slopes: jax.Array | None = None,
) -> jax.Array:
    """q: [B, 1, Hq, D]; cache: modules.attention.KVCache ([B, Hkv, L, D]);
    length: scalar or [B] valid-entry counts. slopes [Hq] f32 enables the
    ALiBi position bias. Returns [B, 1, Hq, D].

    Falls back to the XLA oracle when the cache length isn't block-aligned
    (init_kv_cache rounds allocations to 128, so this is rare).
    """
    from eetq_tpu.modules.attention import attention_decode_ref

    b, s, hq, d = q.shape
    assert s == 1, "flash_decode is the single-token path"
    hkv, lmax = cache.k.shape[1], cache.k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # L-block choice (same spirit as the w8a16 bk rule): the sublane-
    # aligned divisor of lmax CLOSEST to block_l, searching up to
    # 4*block_l — slightly-oversized blocks beat the tiny ones awkward
    # cache lengths otherwise degrade to (a 1088-slot cache gets bl=544,
    # where the old halve-from-512 search found 64: 17 grid steps of
    # per-head VPU work, the r2 tight-cache loss). A round 2048-slot
    # cache still picks exactly 512. block_h shrinks with bl, so VMEM
    # stays bounded either way.
    divisors = [c for c in range(8, min(4 * block_l, lmax) + 1, 8)
                if lmax % c == 0]
    if not divisors:
        return attention_decode_ref(
            q, cache, length, window, scale, slopes=slopes
        )
    bl = min(divisors, key=lambda c: (abs(c - block_l), -c))
    nl = lmax // bl

    if block_h is None:
        # enough heads per step that scratch bands fill sublanes, capped so
        # the KV block stays ~512 KiB
        block_h = max(1, min(hkv, 32 // group, (512 * 1024) // (bl * d)))
    bh = block_h
    while hkv % bh:
        bh -= 1
    nh = hkv // bh

    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (b,))
    qg = q[:, 0].reshape(b, hkv, group, d)

    quantized = cache.quantized

    def kv_map(bb, h, li, lens):
        # clamp the L-block index to the last VALID block for this row:
        # repeated indices make Pallas skip the re-fetch, so only
        # ceil(length/bl) blocks are DMA'd
        return bb, h, jnp.minimum(li, jnp.maximum(lens[bb] - 1, 0) // bl), 0

    in_specs = [
        pl.BlockSpec((1, bh, group, d), lambda bb, h, li, lens: (bb, h, 0, 0)),
        pl.BlockSpec((1, bh, bl, d), kv_map),
        pl.BlockSpec((1, bh, bl, d), kv_map),
    ]
    operands = [qg, cache.k, cache.v]
    if quantized:
        in_specs.append(pl.BlockSpec((1, bh, bl, 1), kv_map))
        in_specs.append(pl.BlockSpec((1, bh, bl, 1), kv_map))
        operands.append(cache.k_scale.reshape(b, hkv, lmax, 1))
        operands.append(cache.v_scale.reshape(b, hkv, lmax, 1))
    alibi = slopes is not None
    if alibi:
        in_specs.append(
            pl.BlockSpec(
                (1, hq),
                lambda bb, h, li, lens: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        operands.append(slopes.astype(jnp.float32).reshape(1, hq))

    kernel = functools.partial(
        _fd_kernel, nl, bl, bh, scale, window, quantized, alibi
    )
    srows = max(bh * group, 8)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nh, nl),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bh, group, d), lambda bb, h, li, lens: (bb, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((srows, 128), jnp.float32),  # running max
                pltpu.VMEM((srows, 128), jnp.float32),  # running sum
                pltpu.VMEM((srows, d), jnp.float32),    # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, *operands)
    return out.reshape(b, 1, hq, d)
