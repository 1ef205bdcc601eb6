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
- int8 KV caches dequantize by scaling the SCORES/PROBS (scales stream in
  their natural [B, Hkv, L] layout, L in lanes; the element-wise dequant
  with [.., L, 1] scale views used through r3 padded every 4-byte scale
  to a 128-lane row — more traffic than the bf16 cache it replaced) —
  the full bandwidth win, unlike the XLA path which materializes the
  dequantized cache;
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
    sq: int = 1,
):
    # sq > 1 = MULTI-QUERY (speculative-decode verify): the "group" axis of
    # q/out carries G*sq rows per kv head, query row (gg, ii) sits at
    # absolute position length - sq + ii, and masks are per-row causal.
    # The sq == 1 path is bit-for-bit untouched (same mask set, no extra
    # ops), and each verify row sees the same block schedule and per-row
    # accumulation order as a single-token call at its own length — so
    # verify logits are BITWISE equal to sequential decode logits.
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

    def sc(ref, t, li_start):
        # per-token scales keep L in the LANE dim and arrive as the WHOLE
        # [Hkv, L] plane of the current batch row (both dims ride the
        # equal-to-array-dim tile exemption; fetched once per row since
        # the index map ignores h/l) — the kernel slices its [1, bl] row.
        # `hi` is read at kernel trace top (program_id doesn't lower
        # inside pl.when closures in interpret mode).
        h = hi * bh + t
        if paged:
            return ref[0, 0, h][None, :]  # pool block: full bs lanes
        return ref[0, h, pl.ds(li_start, ref.shape[-1] // nl)][None, :]

    b = pl.program_id(0)
    hi = pl.program_id(1)
    li = pl.program_id(2)
    length = len_ref[b]
    g = q_ref.shape[2]  # rows per kv head = (q group) * sq
    gq = g // sq  # true GQA group size
    if alibi:
        # q head index of (kv head t, group row gg) = (hi*bh + t)*gq + gg;
        # read at trace top level (program_id doesn't lower inside pl.when
        # closures in interpret mode). Multi-query rows (gg, ii) share the
        # head's slope.
        slopes_all = [
            [slopes_ref[0, (hi * bh + t) * gq + gg] for gg in range(gq)]
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
        # earliest row's window start: (length - sq) - window + 1
        should_run &= block_start + bl - 1 >= length - (sq - 1) - window

    @pl.when(should_run)
    def _run():
        # ALL bh heads in ONE pair of block-diagonal-masked dots. The r2/r3
        # kernel looped over heads doing [G, bl] x [bl, D] work — at MHA
        # shapes (G = 1) that is a latency chain of tiny VPU/MXU ops, and
        # the kernel ran ~3x off its bandwidth floor (r4 trace: 32 us/layer
        # vs an 11 us int8 floor at S~1k). Computing the full
        # [bh*G, bh*bl] score matrix does bh x the MXU work — but the MXU
        # is idle at decode shapes, while the batched softmax runs one
        # 8-sublane VPU pass instead of bh serial ones. Off-band (cross-
        # head) entries are masked to MASK_VALUE and die in exp().
        rows, cols, d = bh * g, bh * bl, q_ref.shape[-1]
        jlane = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        own = (jlane // bl) == (
            jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
        )
        col = block_start + (jlane - (jlane // bl) * bl)  # cache position
        if sq == 1:
            mask = own & (col < length)
            if window is not None:
                mask &= col >= length - window
        else:
            # per-row causal: row (t, gg, ii) queries position length-sq+ii
            ii = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) % sq
            )
            qpos = length - sq + ii
            mask = own & (col <= qpos)
            if window is not None:
                mask &= col > qpos - window
        kb = (kv(k_ref, slice(None))).reshape(cols, d)
        vb = (kv(v_ref, slice(None))).reshape(cols, d)
        if quantized:
            # int8 KV dequantizes by SCALING THE SCORES/PROBS, not the
            # elements: scales stream in their natural layout (L in
            # lanes — a [.., L, 1] view pads every 4-byte scale to a
            # 128-lane row, ~128x the scale traffic, which is exactly
            # what made int8 KV slower than bf16 through r3), and
            # q.(ks*k) == (q.k)*ks per token column.
            kb = kb.astype(jnp.bfloat16)
            vb = vb.astype(jnp.bfloat16)
        qb = (
            q_ref[0].reshape(rows, d).astype(jnp.float32) * scale
        ).astype(kb.dtype)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, cols]
        if quantized:
            ks_full = jnp.concatenate(
                [sc(ks_ref, t, block_start) for t in range(bh)], axis=1
            )  # [1, cols]
            s = s * ks_full.astype(jnp.float32)
        if alibi:
            sl = jnp.stack(
                [
                    slopes_all[t][gg]
                    for t in range(bh)
                    for gg in range(gq)
                    for _ in range(sq)
                ]
            )  # [rows]; row (t, gg, ii) queries position length-sq+ii
            qp = (length - 1) if sq == 1 else qpos
            s = s + sl[:, None] * (col - qp).astype(jnp.float32)
        s = jnp.where(mask, s, MASK_VALUE)

        r = slice(0, rows)
        m_prev = m_ref[r]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        if sq > 1:
            # a visited block can be FULLY masked for some rows (their
            # window starts later / their qpos is earlier); if such a row
            # has no data yet, m_next == MASK_VALUE and exp(0) would
            # inject 1s — force masked entries to exact 0. (The sq == 1
            # guard schedule can't hit this; path left untouched.)
            p = jnp.where(mask, p, 0.0)
        l_ref[r] = l_ref[r] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[r] = m_next
        if quantized:
            # v's per-token scales fold into the probabilities; off-band
            # entries are already 0 so the wrong-head scales they see
            # don't matter
            vs_full = jnp.concatenate(
                [sc(vs_ref, t, block_start) for t in range(bh)], axis=1
            )
            p = p * vs_full.astype(jnp.float32)
        pv = jax.lax.dot(
            p.astype(vb.dtype), vb, preferred_element_type=jnp.float32
        )
        acc_ref[r] = acc_ref[r] * alpha + pv

    @pl.when(li == nl - 1)
    def _finalize():
        rows = bh * g
        l = l_ref[:rows, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out_ref[0] = (acc_ref[:rows] * l_inv).astype(out_ref.dtype).reshape(
            bh, g, out_ref.shape[-1]
        )


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
    L-block size is the pool's block_size (whole pool blocks).

    S == 1 is the decode step; S > 1 is the MULTI-QUERY verify step
    (speculative decoding over paged caches) — same per-row-causal masking
    and bitwise-vs-sequential guarantee as the dense `flash_decode`."""
    b, s, hq, d = q.shape
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
    # row layout per kv head: (group member, query index), query fastest —
    # identical to the dense multi-query path (s == 1 collapses to [.., G, d])
    qg = (
        q.reshape(b, s, hkv, group, d)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, hkv, group * s, d)
    )
    quantized = cache.quantized

    # pools have no batch dim; a leading [1] axis keeps the same per-block
    # layout as the dense kernel, with the POOL block chosen by the table
    def _live_block(bb, li, lens):
        """Clamp the L-block index into this row's LIVE range: above the
        last valid block (repeated index -> Pallas skips the re-fetch) and,
        under a sliding window, below the first block the kernel's
        should_run would compute (pre-window blocks repeat the first live
        block's DMA instead of streaming dead KV)."""
        last = jnp.maximum(lens[bb] - 1, 0) // bs
        li = jnp.minimum(li, last)
        if window is not None:
            lo = jnp.maximum(lens[bb] - (s - 1) - window, 0) // bs
            li = jnp.maximum(li, jnp.minimum(lo, last))
        return li

    def kv_map_pool(bb, h, li, lens, tbl):
        return 0, tbl[bb, _live_block(bb, li, lens)], h, 0, 0

    in_specs = [
        pl.BlockSpec((1, bh, group * s, d),
                     lambda bb, h, li, lens, tbl: (bb, h, 0, 0)),
        pl.BlockSpec((1, 1, bh, bs, d), kv_map_pool),
        pl.BlockSpec((1, 1, bh, bs, d), kv_map_pool),
    ]
    operands = [qg, cache.k[None], cache.v[None]]
    if quantized:
        # scales keep their natural [NB, Hkv, BS] layout (BS in lanes) —
        # a trailing-1 axis would pad every 4-byte scale to a 128-lane
        # row (~128x the scale traffic). The whole head plane ships per
        # pool block (Hkv rides the equal-dim tile exemption).
        def sc_map_pool(bb, h, li, lens, tbl):
            return 0, tbl[bb, _live_block(bb, li, lens)], 0, 0

        in_specs.append(pl.BlockSpec((1, 1, hkv, bs), sc_map_pool))
        in_specs.append(pl.BlockSpec((1, 1, hkv, bs), sc_map_pool))
        operands.append(cache.k_scale[None])
        operands.append(cache.v_scale[None])
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
        _fd_kernel, nl, bs, bh, scale, window, quantized, alibi, paged=True,
        sq=s,
    )
    srows = max(bh * group * s, 8)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nh, nl),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bh, group * s, d),
                lambda bb, h, li, lens, tbl: (bb, h, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((srows, 128), jnp.float32),
                pltpu.VMEM((srows, 128), jnp.float32),
                pltpu.VMEM((srows, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group * s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, cache.table, *operands)
    return (
        out.reshape(b, hkv, group, s, d)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, s, hq, d)
    )


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
    """q: [B, S, Hq, D]; cache: modules.attention.KVCache ([B, Hkv, L, D]);
    length: scalar or [B] valid-entry counts INCLUDING the S new tokens.
    slopes [Hq] f32 enables the ALiBi position bias. Returns [B, S, Hq, D].

    S == 1 is the decode step. S > 1 is the MULTI-QUERY verify step
    (speculative decoding): query row i sits at position length - S + i
    with per-row causal masking, and — because the block schedule (bl, bh)
    is chosen identically to the S == 1 call on the same cache and each
    row's online-softmax accumulation order matches — its output is
    BITWISE equal to a single-token call at length - S + i + 1.

    Falls back to the XLA oracle when the cache length isn't block-aligned
    (init_kv_cache rounds allocations to 128, so this is rare).
    """
    from eetq_tpu.modules.attention import (
        attention_decode_ref,
        attention_verify_ref,
    )

    b, s, hq, d = q.shape
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
    # int8 caches additionally need bl % 128 == 0: the kernel lane-slices
    # the full scale plane at li*bl, and Mosaic must statically prove that
    # offset is a multiple of 128 (init_kv_cache rounds lmax to 128, so
    # 128-step divisors always exist).
    quantized = cache.quantized
    step = 128 if quantized else 8
    divisors = [c for c in range(step, min(4 * block_l, lmax) + 1, step)
                if lmax % c == 0]
    if not divisors:
        if s > 1:
            return attention_verify_ref(
                q, cache, length, window, scale, slopes=slopes
            )
        return attention_decode_ref(
            q, cache, length, window, scale, slopes=slopes
        )
    def _bh_for(bl_c):
        # heads per step: fill the VPU sublanes, capped so the KV block
        # stays ~512 KiB
        b_h = max(1, min(hkv, 32 // group, (512 * 1024) // (bl_c * d)))
        while hkv % b_h:
            b_h -= 1
        return b_h

    # The batched score matrix wants >= 8 rows (bh*G) per grid step so the
    # softmax fills the VPU sublanes: among divisors, prefer the closest
    # to block_l that still admits 8 rows under the VMEM cap (a 1152-slot
    # cache picks bl=384/bh=8 over bl=576/bh=4: trading one extra L step
    # for 2x the rows measured faster at MHA shapes).
    bl = max(
        divisors,
        key=lambda c: (min(_bh_for(c) * group, 8), -abs(c - block_l), c),
    )
    nl = lmax // bl

    if block_h is None:
        block_h = _bh_for(bl)
    bh = block_h
    while hkv % bh:
        bh -= 1
    nh = hkv // bh

    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (b,))
    # row layout per kv head: (group member, query index) — query index
    # fastest, matching the kernel's row->qpos mapping
    qg = (
        q.reshape(b, s, hkv, group, d)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, hkv, group * s, d)
    )

    def kv_map(bb, h, li, lens):
        # clamp the L-block index to the last VALID block for this row:
        # repeated indices make Pallas skip the re-fetch, so only
        # ceil(length/bl) blocks are DMA'd
        top = jnp.maximum(lens[bb] - 1, 0) // bl
        li = jnp.minimum(li, top)
        if window is not None:
            # blocks wholly below the sliding-window start are compute-
            # skipped by the kernel (should_run mirrors this bound on the
            # GRID index) — clamp them up to the first LIVE block so their
            # DMA is skipped too; without this a long-context mistral
            # decode fetched every pre-window block (~length/window x the
            # required KV bandwidth)
            lo = jnp.maximum(lens[bb] - (s - 1) - window, 0) // bl
            li = jnp.maximum(li, jnp.minimum(lo, top))
        return bb, h, li, 0

    in_specs = [
        pl.BlockSpec(
            (1, bh, group * s, d), lambda bb, h, li, lens: (bb, h, 0, 0)
        ),
        pl.BlockSpec((1, bh, bl, d), kv_map),
        pl.BlockSpec((1, bh, bl, d), kv_map),
    ]
    operands = [qg, cache.k, cache.v]
    if quantized:
        # natural [B, Hkv, L] scale layout (L in lanes; see the kernel's
        # sc() note — the r2/r3 [.., L, 1] layout was the int8-KV loss).
        # The whole [Hkv, L] plane ships once per batch row (both dims on
        # the equal-dim tile exemption; ~L*4 bytes/head, trivial next to
        # the KV data) and the kernel lane-slices its [1, bl] row.
        def sc_map(bb, h, li, lens):
            return bb, 0, 0

        in_specs.append(pl.BlockSpec((1, hkv, lmax), sc_map))
        in_specs.append(pl.BlockSpec((1, hkv, lmax), sc_map))
        operands.append(cache.k_scale)
        operands.append(cache.v_scale)
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
        _fd_kernel, nl, bl, bh, scale, window, quantized, alibi, sq=s
    )
    srows = max(bh * group * s, 8)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nh, nl),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bh, group * s, d), lambda bb, h, li, lens: (bb, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((srows, 128), jnp.float32),  # running max
                pltpu.VMEM((srows, 128), jnp.float32),  # running sum
                pltpu.VMEM((srows, d), jnp.float32),    # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group * s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, *operands)
    return (
        out.reshape(b, hkv, group, s, d)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, s, hq, d)
    )
