"""Continuous-batching serving engine (slot-based, static shapes).

The reference has NO serving layer — generation/batching is delegated to HF
transformers / TGI / LoRAX (`README.md:56-101`, SURVEY.md §1). On TPU we own
the loop, and the engine implements the TGI-style behavior those hosts
provide on top of eetq: requests arrive at any time, prefill is interleaved
with batched decode, every sequence decodes in lock-step batches, finished
slots are recycled immediately.

TPU-native design constraints drive the architecture:
- STATIC SHAPES: the decode step is one compiled program over a fixed
  [max_batch] slot array; inactive slots compute garbage that is never
  committed (cheaper than recompiling per batch size).
- Per-slot state (position, budget) lives as [B] vectors; the KV cache is
  a preallocated [max_batch, max_len] buffer with per-row write offsets
  (modules/attention.update_cache vector path).
- Prefill compiles once per prompt-length bucket; the prompt is right-
  padded up and positions/masks make padding inert; the prefilled KV block
  is inserted into the slot's cache row with one dynamic_update_slice.

Determinism note: engine outputs are exactly reproducible run-to-run, and
bit-identical to standalone generate() on CPU. On TPU, XLA tiles a
batch-B matmul differently from batch-1, producing ~1e-2 f32 logits jitter
vs the unbatched path; with a real model's argmax margins this never flips
a token (verified: flips occur only when the margin is below the jitter,
which happens with random-weight test models only).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models.config import ModelConfig
from eetq_tpu.models.transformer import ModelParams, forward_inner, init_caches
from eetq_tpu.modules.attention import KVCache
from eetq_tpu.utils.logging import get_logger

log = get_logger(__name__)

DEFAULT_BUCKETS = (32, 128, 512, 1024, 2048)


@dataclasses.dataclass
class Request:
    """One generation request and its accumulated output."""

    uid: int
    prompt: list[int]
    max_new_tokens: int
    temperature: float = 0.0
    top_k: int = 0
    eos_token_id: int | None = None
    lora_id: int = 0  # adapter index when the model carries LoRA banks
    out_tokens: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # streaming: callback fired per committed token, and the poll cursor
    # (index into out_tokens of the first not-yet-polled token)
    on_token: object = None
    polled: int = 0


@functools.partial(
    jax.jit, static_argnames=("cfg", "bucket", "a8"), donate_argnames=("caches",)
)
def _prefill_bucketed(params, cfg: ModelConfig, tokens, true_lens, bucket: int,
                      caches, a8: bool = False, lora_ids=None):
    """Prefill a group of R requests padded to `bucket`. tokens [R, bucket];
    true_lens [R]; caches are R-row [R, max_len] scratch (donated — the
    engine reuses one scratch buffer across prefills instead of allocating
    a fresh cache per request). Returns (each row's last REAL token logits
    [R, V], caches). Right-padding is inert: causal masking means real
    tokens never attend to later (padded) positions, and padded cache rows
    beyond true_len are never read during decode (per-row length masking)."""
    r, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (r, s))
    # last_pos: gather each row's final hidden state BEFORE the lm_head —
    # skips the [R, S, V] f32 logits temp and S x the head FLOPs
    logits, caches = forward_inner(
        params, cfg, tokens, positions, caches, jnp.int32(0), a8=a8,
        lora_idx=lora_ids, last_pos=true_lens - 1,
    )
    return logits[:, -1, :], caches


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "bucket", "upto", "a8", "topk_cap"),
    donate_argnames=("scratch", "caches"),
)
def _prefill_commit(params, cfg: ModelConfig, tokens, true_lens, scratch,
                    caches, slots, key, temps, topks, bucket: int, upto: int,
                    a8: bool = False, topk_cap: int = 0, lora_ids=None):
    """Prefill + slot insert + first-token sampling in ONE dispatch.

    The round-2 admission path took ~4 host round-trips per prefill group
    (prefill dispatch, logits fetch, per-slot insert dispatch, sample
    dispatch + int() fetch) — ~100 ms of relay tax per admission. Fusing
    them leaves one dispatch plus one [R]-token fetch.

    tokens [R, bucket]; true_lens [R]; slots [R] (slot index per scratch
    row, -1 = dummy row -> no insert); temps/topks [R] per-request
    sampling params (0 = greedy). Returns (first_tokens [R], scratch,
    caches)."""
    r, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (r, s))
    logits, scratch = forward_inner(
        params, cfg, tokens, positions, scratch, jnp.int32(0), a8=a8,
        lora_idx=lora_ids, last_pos=true_lens - 1,
    )
    first = _sample_rows(logits[:, -1, :], key, temps, topks, topk_cap)
    # insert each real row's first `upto` positions into its slot (row
    # count R is static and small, so the python loop unrolls). Dummy
    # rows (slot == -1) write the destination's CURRENT content back —
    # the select stays on the small update block, never on the whole
    # cache buffer (a full-buffer jnp.where would read+write every byte
    # of the donated caches per row).
    for row in range(r):
        def ins(b, sc, row=row):
            upd = jax.lax.slice_in_dim(sc, row, row + 1, axis=0)
            upd = jax.lax.slice_in_dim(upd, 0, upto, axis=2).astype(b.dtype)
            start = (jnp.clip(slots[row], 0, b.shape[0] - 1),) + (0,) * (
                b.ndim - 1
            )
            cur = jax.lax.dynamic_slice(b, start, upd.shape)
            upd = jnp.where(slots[row] >= 0, upd, cur)
            return jax.lax.dynamic_update_slice(b, upd, start)

        caches = jax.tree.map(ins, caches, scratch)
    return first, scratch, caches


@functools.partial(
    jax.jit, static_argnames=("cfg", "decode_kernel"), donate_argnames=("caches",)
)
def _decode_batch(params, cfg: ModelConfig, tokens, lengths, caches,
                  decode_kernel: bool = False, lora_ids=None):
    """One lock-step decode over all slots. tokens [B, 1] (current input
    token per slot), lengths [B] (valid cache entries per slot = position
    of `tokens`). Returns (logits [B, V], caches with KV written at
    lengths).

    decode_kernel: engine caches are oversized by design (max_len >>
    typical lengths), where the flash-decode kernel's length-skipping wins
    3.4x over the full-cache XLA read (v5e measured). Enabled on TPU;
    off on CPU so interpret-mode outputs stay bit-identical to generate()."""
    positions = lengths[:, None]
    logits, caches = forward_inner(
        params, cfg, tokens, positions, caches, lengths,
        decode_kernel=decode_kernel, lora_idx=lora_ids,
    )
    return logits[:, -1, :], caches


def _sample_rows(logits, key, temps, topks, topk_cap: int):
    """Per-row mixed greedy/sampled next-token selection, fully on device.

    logits [B, V]; temps [B] f32 (0 = greedy row); topks [B] i32 (0 = no
    top-k filter); topk_cap: STATIC upper bound on any row's top_k (the
    per-row k is dynamic — `lax.top_k` needs a static k, so we take the
    top `topk_cap` once and read each row's own k-th value as its
    threshold). One PRNG key samples all rows independently (categorical
    over batched logits draws per-row Gumbel noise)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]
    if topk_cap > 0:
        vals = jax.lax.top_k(scaled, topk_cap)[0]  # [B, cap], descending
        idx = jnp.clip(topks - 1, 0, topk_cap - 1)[:, None]
        kth = jnp.take_along_axis(vals, idx, axis=1)
        scaled = jnp.where(
            (topks[:, None] > 0) & (scaled < kth), -jnp.inf, scaled
        )
    sampled = jax.random.categorical(key, scaled).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


_sample_rows_jit = jax.jit(_sample_rows, static_argnames=("topk_cap",))


@jax.jit
def _spec_row_keys(base_key, uids):
    """Per-request PRNG keys for the spec window's positional sampler:
    fold the engine's fixed spec base key by each row's request uid."""
    return jax.vmap(lambda u: jax.random.fold_in(base_key, u))(uids)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "decode_kernel", "sample", "topk_cap"),
    donate_argnames=("caches",),
)
def _decode_multi(params, cfg: ModelConfig, tokens, lengths, caches,
                  key, temps, topks, steps: int, decode_kernel: bool = False,
                  sample: bool = False, topk_cap: int = 0, lora_ids=None):
    """`steps` lock-step decode iterations in ONE dispatch (lax.scan,
    caches as donated carry). Behind the ~26 ms relay, per-token host
    round-trips cap the engine regardless of kernel speed; this amortizes
    one round-trip over `steps` tokens. With sample=True the per-slot
    PRNG/temperature/top-k sampling runs INSIDE the scan (device-side), so
    sampled slots get the same window as greedy ones (VERDICT r2 §1 — the
    round-2 engine forced window 1 for any sampled slot).

    Returns (tokens [B, steps], next_tok [B, 1], next_lens [B], next_key,
    caches) — the last four ARE the next call's carry, so the scheduler
    can CHAIN several windows back-to-back entirely on device (async
    dispatches pipeline behind the relay; one host fetch at the end of the
    chain) whenever slot retirement is host-predictable."""

    def body(carry, _):
        tok, lens, caches, key = carry
        logits, caches = forward_inner(
            params, cfg, tok, lens[:, None], caches, lens,
            decode_kernel=decode_kernel, lora_idx=lora_ids,
        )
        if sample:
            key, sub = jax.random.split(key)
            nxt = _sample_rows(logits[:, -1, :], sub, temps, topks, topk_cap)
        else:
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return (nxt[:, None], lens + 1, caches, key), nxt

    (tok, lens, caches, key), toks = jax.lax.scan(
        body, (tokens, lengths, caches, key), None, length=steps
    )
    return toks.T, tok, lens, key, caches


class _ShardedBackend:
    """Forward backend for a TP/DP-sharded model (eetq_tpu.dist.ShardedModel).

    Runs the engine's prefill/decode through shard_map'd forwards. With
    dp > 1 the slot batch is sharded over the data axis: decode is lock-step
    across all shards, and prefill admits up to dp requests per round (one
    scratch row per data shard) so every shard prefills in parallel."""

    def __init__(self, model):
        from eetq_tpu.dist.sharding import DATA_AXIS, make_forward_fn

        self.model = model
        self.params = model.params
        self.cfg = model.cfg
        self.dp = model.mesh.shape[DATA_AXIS]
        self._fwd_rows = make_forward_fn(model, per_row_offset=True)
        # prefill variant: per-row head gather BEFORE the vocab all_gather
        # ([R, 1, V] collective instead of [R, S, V])
        self._fwd_prefill = make_forward_fn(model, last_pos=True)
        self._multi = {}
        self._insert = {}
        self._specw = {}

    @property
    def prefill_rows(self) -> int:
        return self.dp

    @staticmethod
    def fetch(arr):
        """Device result -> full host numpy. Under a MULTI-PROCESS mesh a
        data-sharded output is not fully addressable, so every process
        allgathers it (all processes run the same schedule, so each needs
        every row to keep the host-side slot state in lockstep — the
        cross-host continuous-batching contract, BASELINE config 5)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    def place_caches(self, caches):
        """Place KV caches with the mesh sharding (heads over the model
        axis) so slot-insertion ops see consistently-sharded operands."""
        from jax.sharding import NamedSharding

        from jax.sharding import PartitionSpec as P

        from eetq_tpu.dist.sharding import cache_spec

        sh4 = NamedSharding(self.model.mesh, cache_spec())
        # int8-cache scale arrays are [B, Hkv, L] (3-D)
        sh3 = NamedSharding(self.model.mesh, P(*cache_spec()[:3]))
        return jax.tree.map(
            lambda a: jax.device_put(a, sh4 if a.ndim == 4 else sh3), caches
        )

    def prefill(self, tokens, true_lens, bucket, caches):
        r, s = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (r, s))
        logits, caches = self._fwd_prefill(
            self.params, tokens, positions, caches, jnp.int32(0),
            (true_lens - 1).astype(jnp.int32),
        )
        return logits[:, -1, :], caches

    def decode(self, tokens, lengths, caches, lora_ids=None):
        assert lora_ids is None, "banked LoRA is local-backend only"
        logits, caches = self._fwd_rows(
            self.params, tokens, lengths[:, None], caches, lengths
        )
        return logits[:, -1, :], caches

    def decode_multi(self, tokens, lengths, caches, steps: int, key, temps,
                     topks, sample: bool = False, topk_cap: int = 0,
                     lora_ids=None):
        assert lora_ids is None, "banked LoRA is local-backend only"
        cache_key = (steps, sample, topk_cap)
        fn = self._multi.get(cache_key)
        if fn is None:
            fwd = self._fwd_rows

            @functools.partial(jax.jit, donate_argnames=("caches",))
            def fn(params, tokens, lengths, caches, key, temps, topks):
                def body(carry, _):
                    tok, lens, caches, key = carry
                    logits, caches = fwd(params, tok, lens[:, None], caches, lens)
                    if sample:
                        key, sub = jax.random.split(key)
                        nxt = _sample_rows(
                            logits[:, -1, :], sub, temps, topks, topk_cap
                        )
                    else:
                        nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
                    return (nxt[:, None], lens + 1, caches, key), nxt

                (tok, lens, caches, key), toks = jax.lax.scan(
                    body, (tokens, lengths, caches, key), None, length=steps
                )
                return toks.T, tok, lens, key, caches

            self._multi[cache_key] = fn
        return fn(self.params, tokens, lengths, caches, key, temps, topks)

    def slots_for_row(self, row: int, max_batch: int) -> range:
        """Slots scratch row `row` may be inserted into: its own data shard
        (the shard-local insert requires row's shard == slot's shard)."""
        size = max_batch // self.dp
        return range(row * size, (row + 1) * size)

    def spec_window(self, hist, valid, last, lengths, caches, window: int,
                    k: int, lora_ids=None, sample_args=None,
                    topk_cap: int = 0):
        assert lora_ids is None, "banked LoRA is local-backend only"
        from eetq_tpu.dist.sharding import make_spec_window_fn

        key = (window, k, sample_args is not None, topk_cap)
        fn = self._specw.get(key)
        if fn is None:
            fn = make_spec_window_fn(
                self.model, window, k, sampled=sample_args is not None,
                topk_cap=topk_cap,
            )
            self._specw[key] = fn
        return fn(self.params, hist, valid, last, lengths, caches,
                  sample_args)

    def insert_rows(self, big: KVCache, small: KVCache, src, slot,
                    upto_pad: int):
        """Shard-local slot insert: explicit-sharding meshes refuse dynamic
        slices across the sharded batch dim, so each data shard inserts its
        OWN scratch row into its OWN slot range inside shard_map (the
        scheduler aligns scratch row i with a slot on shard i)."""
        fn = self._insert.get(upto_pad)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from eetq_tpu.dist.sharding import DATA_AXIS, cache_spec

            def leaf_spec(a):
                return cache_spec() if a.ndim == 4 else P(*cache_spec()[:3])

            def local(big, small, src, slot):
                bl = jax.tree.leaves(big)[0].shape[0]
                sl = jax.tree.leaves(small)[0].shape[0]
                base = jax.lax.axis_index(DATA_AXIS) * bl
                src_base = jax.lax.axis_index(DATA_AXIS) * sl
                own = (
                    (slot >= base) & (slot < base + bl)
                    & (src >= src_base) & (src < src_base + sl)
                )

                def ins(b, s):
                    upd = jax.lax.dynamic_slice_in_dim(
                        s, jnp.clip(src - src_base, 0, sl - 1), 1, axis=0
                    )
                    upd = jax.lax.slice_in_dim(
                        upd, 0, upto_pad, axis=2
                    ).astype(b.dtype)
                    start = (jnp.clip(slot - base, 0, bl - 1),) + (0,) * (
                        b.ndim - 1
                    )
                    new = jax.lax.dynamic_update_slice(b, upd, start)
                    return jnp.where(own, new, b)

                return jax.tree.map(ins, big, small)

            spec_big = jax.tree.map(leaf_spec, big)
            spec_small = jax.tree.map(leaf_spec, small)
            fn = jax.jit(
                shard_map(
                    local,
                    mesh=self.model.mesh,
                    in_specs=(spec_big, spec_small, P(), P()),
                    out_specs=spec_big,
                    check_vma=False,
                ),
                donate_argnums=(0,),
            )
            self._insert[upto_pad] = fn
        return fn(big, small, src, slot)


class _LocalBackend:
    """Forward backend for single-device (params, cfg)."""

    def __init__(self, params, cfg, a8_prefill: bool = False):
        self.params = params
        self.cfg = cfg
        self.a8_prefill = a8_prefill
        self.prefill_rows = 1  # Engine may raise it (batched admission)

    def slots_for_row(self, row: int, max_batch: int) -> range:
        return range(max_batch)  # single device: any slot

    @staticmethod
    def fetch(arr):
        return np.asarray(arr)

    def place_caches(self, caches):
        return caches

    def prefill(self, tokens, true_lens, bucket, caches, lora_ids=None):
        return _prefill_bucketed(
            self.params, self.cfg, tokens, true_lens, bucket, caches,
            a8=self.a8_prefill, lora_ids=lora_ids,
        )

    def prefill_commit(self, tokens, true_lens, scratch, caches, slots, key,
                       temps, topks, bucket: int, upto: int, topk_cap: int,
                       lora_ids=None):
        return _prefill_commit(
            self.params, self.cfg, tokens, true_lens, scratch, caches,
            slots, key, temps, topks, bucket, upto,
            a8=self.a8_prefill, topk_cap=topk_cap, lora_ids=lora_ids,
        )

    def prefill_commit_paged(self, tokens, true_lens, scratch, caches,
                             blocks, key, temps, topks, bucket: int, nb: int,
                             topk_cap: int, lora_ids=None):
        return _prefill_commit_paged(
            self.params, self.cfg, tokens, true_lens, scratch, caches,
            blocks, key, temps, topks, bucket, nb,
            a8=self.a8_prefill, topk_cap=topk_cap, lora_ids=lora_ids,
        )

    def spec_window(self, hist, valid, last, lengths, caches, window: int,
                    k: int, lora_ids=None, sample_args=None,
                    topk_cap: int = 0):
        from eetq_tpu.serve.spec import ngram_spec_window

        return ngram_spec_window(
            self.params, self.cfg, hist, valid, last, lengths, caches,
            window, k, lora_ids=lora_ids, sample_args=sample_args,
            topk_cap=topk_cap,
        )

    def decode(self, tokens, lengths, caches, lora_ids=None):
        return _decode_batch(
            self.params, self.cfg, tokens, lengths, caches,
            decode_kernel=jax.default_backend() == "tpu",
            lora_ids=lora_ids,
        )

    def decode_multi(self, tokens, lengths, caches, steps: int, key, temps,
                     topks, sample: bool = False, topk_cap: int = 0,
                     lora_ids=None):
        return _decode_multi(
            self.params, self.cfg, tokens, lengths, caches, key, temps,
            topks, steps,
            decode_kernel=jax.default_backend() == "tpu",
            sample=sample, topk_cap=topk_cap, lora_ids=lora_ids,
        )

    def insert_rows(self, big, small, src, slot, upto_pad: int):
        return _insert_rows(big, small, src, slot, upto_pad)


@functools.partial(
    jax.jit, static_argnames=("cfg", "offset"), donate_argnames=("caches",)
)
def _prefill_chunk_step(params, cfg: ModelConfig, chunk, caches, offset: int,
                        last_idx, lora_ids=None):
    """One STATIC-offset prefill chunk on the scratch caches (the chunk
    attends over cache[:, :, :offset+c] — modules.attention's chunked
    path). Returns (logits at last_idx [R, V], caches)."""
    from eetq_tpu.models.transformer import forward_inner

    r, c = chunk.shape
    positions = jnp.broadcast_to(
        offset + jnp.arange(c, dtype=jnp.int32), (r, c)
    )
    logits, caches = forward_inner(
        params, cfg, chunk, positions, caches, offset, lora_idx=lora_ids,
        last_pos=jnp.broadcast_to(last_idx, (r,)).astype(jnp.int32),
    )
    return logits[:, -1, :], caches


@functools.partial(
    jax.jit, static_argnames=("n_blocks",), donate_argnames=("caches",)
)
def _paged_insert_all(caches, scratch, src_row, blocks, n_blocks: int):
    """All layers' prefill hand-offs into pool blocks in ONE dispatch."""
    from eetq_tpu.modules.paged import paged_insert_dense

    return [
        paged_insert_dense(c, s, src_row, blocks, n_blocks)
        for c, s in zip(caches, scratch)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "bucket", "nb", "a8", "topk_cap"),
    donate_argnames=("scratch", "caches"),
)
def _prefill_commit_paged(params, cfg: ModelConfig, tokens, true_lens,
                          scratch, caches, blocks, key, temps, topks,
                          bucket: int, nb: int, a8: bool = False,
                          topk_cap: int = 0, lora_ids=None):
    """Paged fused admission: prefill + first-token sampling + the
    all-rows, all-layers pool-block hand-off in ONE dispatch + one [R]
    fetch — the paged counterpart of _prefill_commit. (r3 left paged
    admissions on the multi-round-trip path; r4 measured the decode
    windows themselves within 0.16 ms/step of dense, so the admission
    round-trips WERE the paged-vs-dense engine gap.)

    blocks [R, nb] int32: each scratch row's physical pool blocks, padded
    with block 0 — the reserved trash block — so dummy rows and the
    beyond-prompt tail scatter harmlessly. Returns (first_tokens [R],
    scratch, caches)."""
    r, s = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (r, s))
    logits, scratch = forward_inner(
        params, cfg, tokens, positions, scratch, jnp.int32(0), a8=a8,
        lora_idx=lora_ids, last_pos=true_lens - 1,
    )
    first = _sample_rows(logits[:, -1, :], key, temps, topks, topk_cap)
    bs = caches[0].block_size
    idx = blocks.reshape(r * nb)

    def grab(leaf):
        """[R, Hkv, L(, D)] scratch -> [R*nb, Hkv, bs(, D)] block updates."""
        want = nb * bs
        sl = leaf[:, :, : min(want, leaf.shape[2])]
        if sl.shape[2] < want:
            pad = [(0, 0), (0, 0), (0, want - sl.shape[2])]
            pad += [(0, 0)] * (leaf.ndim - 3)
            sl = jnp.pad(sl, pad)
        hkv = leaf.shape[1]
        sl = sl.reshape(r, hkv, nb, bs, *leaf.shape[3:])
        sl = jnp.moveaxis(sl, 2, 1)  # [R, nb, Hkv, bs, ...]
        return sl.reshape(r * nb, hkv, bs, *leaf.shape[3:])

    out = []
    for c, sc in zip(caches, scratch):
        if c.quantized and not sc.quantized:
            raise ValueError("int8 paged pool needs an int8 dense scratch")
        nc = dataclasses.replace(
            c,
            k=c.k.at[idx].set(grab(sc.k).astype(c.k.dtype)),
            v=c.v.at[idx].set(grab(sc.v).astype(c.v.dtype)),
        )
        if c.quantized:
            nc = dataclasses.replace(
                nc,
                k_scale=c.k_scale.at[idx].set(grab(sc.k_scale)),
                v_scale=c.v_scale.at[idx].set(grab(sc.v_scale)),
            )
        out.append(nc)
    return first, scratch, out


@functools.partial(jax.jit, donate_argnames=("caches",))
def _fanout_tables(caches, table):
    """ONE host->device table transfer fanned out into per-layer buffers.
    The decode window donates the cache pytree, so layers can't share a
    single table buffer (it would be donated N times); `+ 0` forces a
    distinct allocation per layer. Replaces N separate jnp.array
    transfers per sync."""
    return [dataclasses.replace(c, table=table + 0) for c in caches]


@functools.partial(
    jax.jit, static_argnames=("upto_pad",), donate_argnames=("big",)
)
def _insert_rows(big: KVCache, small: KVCache, src, slot, upto_pad: int):
    """Copy small[src, :, :upto_pad] into big[slot, :, :upto_pad] (one slot
    row, first upto_pad sequence positions). Generic over cache leaves:
    4-D [B, H, L, D] k/v arrays and 3-D [B, H, L] int8-cache scale arrays
    both have the sequence on axis 2."""

    def ins(b, s):
        upd = jax.lax.dynamic_slice_in_dim(s, src, 1, axis=0)
        upd = jax.lax.slice_in_dim(upd, 0, upto_pad, axis=2).astype(b.dtype)
        start = (slot,) + (0,) * (b.ndim - 1)
        return jax.lax.dynamic_update_slice(b, upd, start)

    return jax.tree.map(ins, big, small)


class Engine:
    """Continuous-batching generation engine over one model.

    Usage:
        eng = Engine(params, cfg, max_batch=8, max_len=2048)
        uid = eng.add_request([1, 2, 3], max_new_tokens=32)
        eng.run()                      # or step() incrementally
        tokens = eng.result(uid)
    """

    def __init__(
        self,
        params: ModelParams,
        cfg: ModelConfig | None = None,
        max_batch: int = 8,
        max_len: int = 2048,
        prompt_buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        kv_dtype=None,
        seed: int = 0,
        a8_prefill: bool | None = None,
        decode_window: int | None = None,
        prefill_rows: int | None = None,
        prefill_chunk: int | None = None,
        paged_blocks: int | None = None,
        paged_block_size: int = 256,
        topk_cap: int = 64,
        max_chain: int = 8,
        spec_ngram: int | None = None,
    ):
        # `params` may be a plain ModelParams (with cfg) or a TP/DP-sharded
        # model (eetq_tpu.dist.ShardedModel; cfg comes from it).
        # a8_prefill runs prefills through the W8A8 int8-activation path
        # (2x MXU; small extra quantization error) — local backend only.
        # decode_window: max decode steps per host round-trip (defaults to
        # 8 on TPU where the relay costs ~26 ms per dispatch, 1 elsewhere).
        # Sampled slots decode inside the same window (device-side per-slot
        # PRNG/temperature/top-k in the scan); topk_cap is the STATIC upper
        # bound any request's top_k may take (lax.top_k needs a static k —
        # the per-row k is dynamic below the cap).
        # r5 measured-default promotion (README "serving defaults"):
        # quantized LOCAL models on TPU get W8A8 int8-activation prefill
        # (interleaved A/Bs: +1.5% at p=128, +5.9% at p=1024 engine tok/s;
        # r4 mistral trace: 178.9 vs 170.8 tok/s served, p99 91.8 vs 98.1
        # ms) and — for LONG caches only (max_len >= 512) — int8 KV
        # (p=1024: 162.0 vs 160.3 tok/s with a8, decode 9.64 vs 9.90
        # ms/step; but p=128: 203.3 vs 213.9, the per-step scale streaming
        # costs more than the small cache saves — scripts/r5_results.jsonl,
        # SNR/KL accuracy gates in tests/test_accuracy.py). Pass
        # kv_dtype=jnp.bfloat16 / a8_prefill=False to opt out; CPU and
        # sharded/paged/dense-model engines keep the bf16-exact defaults.
        on_tpu = jax.default_backend() == "tpu"
        if cfg is None:
            if a8_prefill:
                raise ValueError("a8_prefill is not supported for sharded models yet")
            a8_prefill = False
            if kv_dtype is not None and kv_dtype != jnp.bfloat16:
                # the sharded cache specs (dist.sharding.cache_spec) carry
                # no k_scale/v_scale leaves — an int8 cache would only die
                # later with an opaque shard_map tree mismatch
                raise ValueError(
                    "int8 KV is not supported for sharded models yet "
                    "(pass kv_dtype=jnp.bfloat16 or omit it)"
                )
            kv_dtype = jnp.bfloat16
            self._backend = _ShardedBackend(params)
            params, cfg = self._backend.params, self._backend.cfg
        else:
            from eetq_tpu.modules.linear import QuantLinear as _QL

            q_local = bool(params.layers) and isinstance(
                params.layers[0].qkv, _QL
            )
            if a8_prefill is None:
                a8_prefill = on_tpu and q_local
            if kv_dtype is None:
                kv_dtype = (
                    jnp.int8
                    if on_tpu and q_local and paged_blocks is None
                    and max_len >= 512
                    else jnp.bfloat16
                )
            self._backend = _LocalBackend(params, cfg, a8_prefill=a8_prefill)
            if prefill_rows is not None:
                # batched admission: up to prefill_rows requests prefill in
                # ONE dispatch (single-device only; under DP the row count
                # is fixed at dp, one scratch row per data shard)
                self._backend.prefill_rows = max(
                    1, min(prefill_rows, max_batch)
                )
        if max_batch % self._backend.prefill_rows:
            raise ValueError(
                f"max_batch {max_batch} must divide by dp "
                f"{self._backend.prefill_rows}"
            )
        self.params = params
        self.cfg = cfg
        # multi-adapter LoRA serving (LoRAX-style: one quantized base,
        # per-request adapters — surgery.stack_adapters builds the banks):
        # banked adapters have a leading [n_adapters] axis; requests pick
        # theirs via add_request(lora_id=...)
        def _is_bank(ad):
            return ad is not None and ad.lora_a.ndim == 3

        first_layer = params.layers[0] if getattr(params, "layers", None) else None
        self._lora_banked = first_layer is not None and (
            _is_bank(first_layer.qkv_lora) or _is_bank(first_layer.o_lora)
        )
        if self._lora_banked:
            if isinstance(self._backend, _ShardedBackend):
                raise ValueError(
                    "banked LoRA serving is local-backend only for now"
                )
            bank = first_layer.qkv_lora or first_layer.o_lora
            self._n_adapters = bank.lora_a.shape[0]
        self.lora_ids = np.zeros((max_batch,), np.int32)
        self.max_batch = max_batch
        self.max_len = min(max_len, cfg.max_position)
        self.buckets = tuple(
            sorted(b for b in prompt_buckets if b <= self.max_len)
        ) or (self.max_len,)
        self.kv_dtype = kv_dtype
        if decode_window is None:
            decode_window = 8 if jax.default_backend() == "tpu" else 1
        self.decode_window = max(1, decode_window)
        # spec_ngram=k: decode windows run n-gram (prompt-lookup)
        # SPECULATIVE rounds instead of sequential steps — each verify
        # forward over k+1 tokens rides the m<=8 decode-GEMV regime and
        # costs ~one decode step, so every accepted draft token is nearly
        # free (serve/spec.py).
        self.spec_ngram = spec_ngram
        if spec_ngram is not None and not 1 <= spec_ngram <= 7:
            raise ValueError("spec_ngram must be in [1, 7] (the k+1-"
                             "token verify must stay in the m<=8 "
                             "decode regime)")
        # Physical KV length: the spec verify writes k+1 DRAFT entries at
        # start = lengths + m, and inside one device-side window a row can
        # advance up to window-1 first — near max_len those writes would
        # otherwise be CLAMPED by dynamic_update_slice (dense) / the block
        # table bound (paged) onto committed KV and corrupt it. Same slack
        # as spec_generate's `max_len = s + new + 2k + 1` (spec.py:330),
        # plus the window advance. Requests are still budgeted against
        # max_len; only the allocation is larger.
        self._kv_len = self.max_len + (
            self.decode_window + 2 * spec_ngram + 1 if spec_ngram else 0
        )
        # paged_blocks: decode caches become a shared block POOL of that
        # many paged_block_size-token blocks per layer (vLLM-style paging,
        # TPU-native — modules.paged). Slots borrow blocks as their
        # sequences grow and return them on retirement, so device memory
        # scales with LIVE tokens, not max_batch * max_len. Local backend
        # only; prefill still runs on the dense scratch and hands off.
        self.paged = paged_blocks is not None
        if self.paged:
            if isinstance(self._backend, _ShardedBackend):
                raise ValueError("paged KV is local-backend only for now")
            from eetq_tpu.modules.paged import init_paged_kv_cache

            bs = paged_block_size
            self.paged_bs = bs
            self._max_seq_blocks = -(-self._kv_len // bs)
            self.caches = [
                init_paged_kv_cache(
                    paged_blocks, bs, cfg.num_kv_heads, cfg.head_dim,
                    max_batch, self._max_seq_blocks, kv_dtype,
                )
                for _ in range(cfg.num_layers)
            ]
            if paged_blocks < 2:
                raise ValueError("paged_blocks must be >= 2")
            if bs > -(-self.max_len // 128) * 128:
                raise ValueError(
                    f"paged_block_size {bs} exceeds the (rounded) max_len"
                )
            # block 0 is a TRASH block, never allocated: inactive slots'
            # lock-step garbage writes land there (their table rows point
            # at it), so freed-and-reallocated blocks can't be corrupted
            self._free_blocks = list(range(paged_blocks - 1, 0, -1))
            self._slot_blocks: list[list[int]] = [[] for _ in range(max_batch)]
            self._table_np = np.zeros(
                (max_batch, self._max_seq_blocks), np.int32
            )
            self._table_dirty = True
        else:
            self.caches = self._backend.place_caches(
                init_caches(cfg, max_batch, self._kv_len, kv_dtype)
            )
        # prefill_chunk: prompts whose bucket exceeds this prefill one
        # chunk per scheduler step (decode advances BETWEEN chunks —
        # bounded head-of-line latency for running slots). Local backend
        # only; chunk must divide the buckets it applies to.
        if prefill_chunk is not None and isinstance(
            self._backend, _ShardedBackend
        ):
            raise ValueError("prefill_chunk is local-backend only")
        self.prefill_chunk = prefill_chunk
        # in-flight chunked prefill: (req, slot, toks [1, bucket], n, done)
        self._chunking: tuple | None = None
        self._scratch = None  # reused prefill scratch caches
        self._scratch_len = 0
        self.topk_cap = int(topk_cap)
        # max_chain: upper bound on back-to-back decode windows per
        # scheduler step (window * max_chain tokens between host fetches
        # when the batch is full — see step()'s chaining rules)
        self.max_chain = max(1, int(max_chain))
        self._key = jax.random.PRNGKey(seed)
        # spec sampled streams: a FIXED base key (fold_in by request uid,
        # then by emission index) so a request's sampled tokens don't
        # depend on window size or scheduling — see spec._sample_pos_rows
        self._spec_key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5bec)
        self._uid = itertools.count()
        self.queue: deque[Request] = deque()
        self.requests: dict[int, Request] = {}
        # host-side slot state
        self.slot_req: list[Request | None] = [None] * max_batch
        self.lengths = np.zeros((max_batch,), np.int32)
        self.next_token = np.zeros((max_batch,), np.int32)

    # ---- client API ----

    def add_request(
        self,
        prompt,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_k: int = 0,
        eos_token_id: int | None = None,
        lora_id: int = 0,
        on_token=None,
    ) -> int:
        prompt = [int(t) for t in np.asarray(prompt).ravel()]
        if not prompt:
            raise ValueError("empty prompt")
        if max_new_tokens < 1:
            # admission unconditionally commits the first prefill-sampled
            # token, so a <=0 budget could not be honored anyway
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new_tokens}")
        if len(prompt) + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_len {self.max_len}"
            )
        if top_k >= self.cfg.vocab_size:
            top_k = 0  # filtering the whole vocab is a no-op
        if temperature > 0 and top_k > self.topk_cap:
            raise ValueError(
                f"top_k {top_k} exceeds the engine's topk_cap "
                f"{self.topk_cap} (a static bound for the compiled decode "
                f"window) — construct Engine(topk_cap=...) larger"
            )
        if lora_id:
            if not self._lora_banked:
                raise ValueError(
                    "lora_id requires a model with adapter banks "
                    "(surgery.stack_adapters)"
                )
            if not 0 <= lora_id < self._n_adapters:
                raise ValueError(
                    f"lora_id {lora_id} out of range [0, {self._n_adapters})"
                )
        r = Request(
            uid=next(self._uid),
            prompt=prompt,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_k=top_k,
            eos_token_id=eos_token_id,
            lora_id=lora_id,
            on_token=on_token,
        )
        self.queue.append(r)
        self.requests[r.uid] = r
        return r.uid

    def result(self, uid: int) -> list[int]:
        r = self.requests[uid]
        if not r.done:
            raise ValueError(f"request {uid} not finished")
        return r.out_tokens

    def poll(self, uid: int) -> tuple[list[int], bool]:
        """Incremental streaming fetch: tokens committed since the last
        poll for this request, plus whether it has finished. Tokens arrive
        in decode-window bursts (the engine fetches from the device once
        per window/chain), so callers should poll between `step()` calls
        rather than expect one token per poll."""
        r = self.requests[uid]
        new = r.out_tokens[r.polled:]
        r.polled = len(r.out_tokens)
        return new, r.done

    def warmup(self, temperature: float = 0.0) -> None:
        """Pre-compile every program the serving loop can hit, BEFORE real
        traffic: per-bucket grouped prefill (+fused admission), the
        windowed decode (which chaining reuses), and the single-step
        decode used next to admissions. The windowed PAGED decode in
        particular has a long first compile through a remote-compile
        tunnel — serving without warmup pays it on the first request
        (the TGI-style warmup the reference relies on its host for).

        Runs a shaped mini-workload through the normal scheduler, then
        clears its requests; slot/cache state is reusable garbage
        (overwritten on slot reuse, like any retired request's rows).
        temperature > 0 additionally compiles the sampled variants."""
        assert not self.has_work, "warmup() requires an idle engine"
        kw = dict(temperature=temperature,
                  top_k=min(8, self.topk_cap) if temperature > 0 else 0)
        new = self.decode_window + 2
        uids = []
        for b in self.buckets:
            # one request per bucket compiles its grouped prefill (rows are
            # padded to the full group); the decode programs are shaped by
            # max_batch regardless of how many slots are live
            n = min(b, self.max_len - new)
            uids.append(self.add_request([1] * n, new, **kw))
            self.run()
        rows = self._backend.prefill_rows
        if self.max_batch > rows:
            # the single-step-near-admission program only runs when a step
            # ends with the queue still non-empty AND a free slot — i.e.
            # one admission round (capped at prefill_rows) couldn't drain
            # the queue. Reproduce that state: more queued requests than
            # one round can admit. (With max_batch <= prefill_rows the
            # state — and the program — is unreachable in real traffic.)
            n = min(self.buckets[0], self.max_len - new)
            for _ in range(rows + 1):
                uids.append(self.add_request([1] * n, new, **kw))
            self.run()
        for u in uids:
            del self.requests[u]

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slot_req)

    # ---- scheduling ----

    @property
    def free_slots(self) -> int:
        """Number of currently unoccupied decode slots (public: callers use
        it to feed arrivals 'as slots free up')."""
        return sum(1 for s in self.slot_req if s is None)

    def _free_slot(self) -> int | None:
        for i, s in enumerate(self.slot_req):
            if s is None:
                return i
        return None

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_len

    def _ensure_scratch(self, need: int) -> None:
        """(Re)allocate the shared prefill scratch to cover `need` positions.

        Scratch normally stays at max(buckets) — sizing it to max_len up
        front would waste device memory — but `_bucket_for` returns max_len
        for prompts longer than the largest bucket (add_request accepts
        them), so the scratch must grow to max_len the first time such a
        prompt arrives. Only two sizes are ever allocated (max(buckets),
        max_len), so prefill recompiles are bounded."""
        if self._scratch is not None and self._scratch_len >= need:
            return
        size = max(self.buckets) if need <= max(self.buckets) else self.max_len
        self._scratch = self._backend.place_caches(
            init_caches(self.cfg, self._backend.prefill_rows, size,
                        self.kv_dtype)
        )
        self._scratch_len = size

    # ---- paged-KV block allocator (host side) ----

    def _alloc_blocks(self, slot: int, upto_tokens: int) -> None:
        """Grow the slot's block list to cover `upto_tokens` positions."""
        need = min(-(-upto_tokens // self.paged_bs), self._max_seq_blocks)
        blocks = self._slot_blocks[slot]
        while len(blocks) < need:
            if not self._free_blocks:
                hint = (
                    " (spec_ngram engines additionally reserve up to "
                    "ceil((window + 2k + 1)/block_size) + 1 overshoot "
                    "blocks per ACTIVE slot for draft KV — size the pool "
                    "for max_batch * ceil(_kv_len/block_size))"
                    if self.spec_ngram
                    else ""
                )
                raise RuntimeError(
                    "paged KV pool exhausted — raise paged_blocks, lower "
                    "max_batch, or shorten max_new_tokens" + hint
                )
            b = self._free_blocks.pop()
            self._table_np[slot, len(blocks)] = b
            blocks.append(b)
            self._table_dirty = True

    def _release_blocks(self, slot: int) -> None:
        self._free_blocks.extend(reversed(self._slot_blocks[slot]))
        self._slot_blocks[slot] = []
        self._table_np[slot, :] = 0  # point the row at the trash block
        self._table_dirty = True

    def _sync_tables(self) -> None:
        if self.paged and self._table_dirty:
            self.caches = _fanout_tables(
                self.caches, jnp.asarray(self._table_np)
            )
            self._table_dirty = False

    def _paged_activate(self, row: int, slot: int, n: int) -> None:
        """Hand the prefilled scratch row off into the slot's pool blocks."""
        self._alloc_blocks(slot, n)
        self._sync_tables()
        nb = len(self._slot_blocks[slot])
        blocks = jnp.asarray(self._table_np[slot, :nb])
        # ONE dispatch for all layers
        self.caches = _paged_insert_all(
            self.caches, self._scratch, jnp.int32(row), blocks, nb
        )

    def _prefill_group(self, assignments: list[tuple[int, int, Request]]) -> None:
        """Prefill up to prefill_rows requests in one dispatch (one scratch
        row per data shard under DP) and insert each into its slot.
        assignments: (scratch_row, slot, request); under DP the scheduler
        guarantees scratch_row == data shard of slot (shard-local insert).

        Local dense backend: the whole admission (prefill + all slot
        inserts + first-token sampling) is ONE fused dispatch + one [R]
        fetch (_prefill_commit). Paged/sharded: prefill dispatch + batched
        device-side sampling (one fetch), then the backend-specific
        hand-off."""
        rows = self._backend.prefill_rows
        assert 0 < len(assignments) <= rows
        bucket = max(self._bucket_for(len(r.prompt)) for _, _, r in assignments)
        toks = np.zeros((rows, bucket), np.int32)
        lens = np.ones((rows,), np.int32)  # dummy rows: 1 token, discarded
        slots_np = np.full((rows,), -1, np.int32)
        temps_np = np.zeros((rows,), np.float32)
        topks_np = np.zeros((rows,), np.int32)
        lids_np = np.zeros((rows,), np.int32)
        for row, slot, req in assignments:
            n = len(req.prompt)
            toks[row, :n] = req.prompt
            lens[row] = n
            slots_np[row] = slot
            lids_np[row] = req.lora_id
            self.lora_ids[slot] = req.lora_id
            if req.temperature > 0:
                temps_np[row] = req.temperature
                topks_np[row] = req.top_k
        self._ensure_scratch(bucket)
        upto = min(bucket, self.max_len)
        self._key, sub = jax.random.split(self._key)
        lids = jnp.asarray(lids_np) if self._lora_banked else None
        local = hasattr(self._backend, "prefill_commit")
        fused = local and not self.paged
        paged_fused = local and self.paged
        if fused:
            first, self._scratch, self.caches = self._backend.prefill_commit(
                jnp.asarray(toks), jnp.asarray(lens), self._scratch,
                self.caches, jnp.asarray(slots_np), sub,
                jnp.asarray(temps_np), jnp.asarray(topks_np), bucket, upto,
                self.topk_cap if temps_np.any() else 0, lora_ids=lids,
            )
            first_np = np.asarray(first)  # the ONLY host fetch
        elif paged_fused:
            # allocate pool blocks + sync tables BEFORE the one fused
            # dispatch; rows pad their block list with the trash block (0)
            nb = min(-(-upto // self.paged_bs), self._max_seq_blocks)
            blocks_np = np.zeros((rows, nb), np.int32)
            for row, slot, req in assignments:
                self._alloc_blocks(slot, len(req.prompt))
                bl = self._slot_blocks[slot][:nb]
                blocks_np[row, : len(bl)] = bl
            self._sync_tables()
            first, self._scratch, self.caches = (
                self._backend.prefill_commit_paged(
                    jnp.asarray(toks), jnp.asarray(lens), self._scratch,
                    self.caches, jnp.asarray(blocks_np), sub,
                    jnp.asarray(temps_np), jnp.asarray(topks_np), bucket, nb,
                    self.topk_cap if temps_np.any() else 0, lora_ids=lids,
                )
            )
            first_np = np.asarray(first)  # the ONLY host fetch
        else:
            if self._lora_banked:
                raise NotImplementedError(
                    "banked LoRA serving is local-backend only"
                )
            logits, self._scratch = self._backend.prefill(
                jnp.asarray(toks), jnp.asarray(lens), bucket, self._scratch
            )
            if isinstance(self._backend, _ShardedBackend):
                # explicit-sharding meshes refuse mixing the data-sharded
                # logits with replicated sampling params — fetch first
                # (allgathered under a multi-process mesh)
                logits = jnp.asarray(self._backend.fetch(logits))
            first_np = np.asarray(
                _sample_rows_jit(
                    logits, sub, jnp.asarray(temps_np), jnp.asarray(topks_np),
                    topk_cap=self.topk_cap if temps_np.any() else 0,
                )
            )
        for row, slot, req in assignments:
            if not fused and not paged_fused:
                # sharded backend: one dispatch for ALL layers (generic
                # tree.map insert). (Paged is local-only, so paged always
                # goes through the fused prefill_commit_paged above —
                # there is no unfused paged admission.)
                self.caches = self._backend.insert_rows(
                    self.caches, self._scratch, jnp.int32(row),
                    jnp.int32(slot), upto,
                )
            n = len(req.prompt)
            self.slot_req[slot] = req
            self.lengths[slot] = n
            tok = int(first_np[row])
            self.next_token[slot] = tok
            self._commit(slot, tok)

    def _chunk_eligible(self, req: Request) -> bool:
        """True when `req`'s prompt bucket must prefill via the chunked
        path (prefill_chunk set, bucket larger than and divisible by it)."""
        if not self.prefill_chunk:
            return False
        bucket = self._bucket_for(len(req.prompt))
        return (
            bucket > self.prefill_chunk
            and bucket % self.prefill_chunk == 0
        )

    def _start_chunked(self, slot: int, req: Request) -> None:
        """Begin a chunked prefill: the slot is reserved (slot_req set, but
        lengths stays 0 so decode skips it) and one chunk runs per
        scheduler step on the scratch cache — decode for RUNNING slots
        advances between chunks instead of stalling for the whole prompt."""
        rows = self._backend.prefill_rows
        bucket = self._bucket_for(len(req.prompt))
        toks = np.zeros((rows, bucket), np.int32)
        toks[0, : len(req.prompt)] = req.prompt
        self._ensure_scratch(bucket)
        self.slot_req[slot] = req  # reserve (lengths[slot] == 0 -> no decode)
        self._chunking = (req, slot, toks, bucket, 0, None)
        self._chunk_step()

    def _chunk_step(self) -> None:
        """Advance the in-flight chunked prefill by ONE chunk."""
        req, slot, toks, bucket, done, last_logits = self._chunking
        c = self.prefill_chunk
        offset = done * c
        n = len(req.prompt)
        chunk = jnp.asarray(toks[:, offset : offset + c])
        # index of the LAST REAL token within this chunk (clamped; only the
        # owning chunk's gather is kept)
        li = min(max(n - 1 - offset, 0), c - 1)
        rows = self._backend.prefill_rows
        lids = (
            jnp.full((rows,), req.lora_id, jnp.int32)
            if self._lora_banked else None
        )
        logits, self._scratch = _prefill_chunk_step(
            self.params, self.cfg, chunk, self._scratch, offset,
            jnp.int32(li), lora_ids=lids,
        )
        if offset <= n - 1 < offset + c:
            last_logits = logits
        done += 1
        if done * c < bucket:
            self._chunking = (req, slot, toks, bucket, done, last_logits)
            return
        # final chunk done: sample and activate the slot
        self._chunking = None
        self._key, sub = jax.random.split(self._key)
        # the SAME sampler as every other path (step()'s one-sampler
        # invariant): per-row temps/topks vectors, one compile for all
        # (temperature, top_k) combinations
        tok = int(
            _sample_rows_jit(
                jnp.asarray(np.asarray(last_logits)[0])[None], sub,
                jnp.asarray([req.temperature], jnp.float32),
                jnp.asarray([req.top_k], jnp.int32),
                topk_cap=self.topk_cap,
            )[0]
        )
        if self.paged:
            self._paged_activate(0, slot, n)
        else:
            upto = min(bucket, self.max_len)
            self.caches = self._backend.insert_rows(
                self.caches, self._scratch, jnp.int32(0), jnp.int32(slot), upto
            )
        self.lora_ids[slot] = req.lora_id
        self.lengths[slot] = n
        self.next_token[slot] = tok
        self._commit(slot, tok)

    def _commit(self, slot: int, tok: int) -> None:
        """Append a sampled token to the slot's request; retire if done."""
        req = self.slot_req[slot]
        req.out_tokens.append(tok)
        if req.on_token is not None:
            req.on_token(req.uid, tok)
        hit_eos = req.eos_token_id is not None and tok == req.eos_token_id
        if hit_eos or len(req.out_tokens) >= req.max_new_tokens:
            req.done = True
            self.slot_req[slot] = None
            self.lengths[slot] = 0
            if self.paged:
                self._release_blocks(slot)

    def _spec_decode_window(self, active: list[int], window: int) -> None:
        """Advance all active slots by one SPECULATIVE decode window:
        device-side n-gram rounds until every row has emitted >= window
        tokens (serve.spec.ngram_spec_window), then commit per-row counts.
        The history each row's drafts match against is its own committed
        prompt + output — rebuilt host-side per window from the Request
        (cheap: one [B, H] int32 upload riding the dispatch)."""
        k = self.spec_ngram
        if self.paged:
            # verify rounds write KV up to position lengths + window-1 + k
            # per row; cover every committed position (<= lengths + window)
            # AND the draft overshoot so no accepted token's KV lands in
            # the trash block
            for i in active:
                self._alloc_blocks(i, int(self.lengths[i]) + window + k + 1)
            self._sync_tables()
        hist_len = self.max_len + window + 2 * k + 2
        hist = np.zeros((self.max_batch, hist_len), np.int32)
        valid = np.full((self.max_batch,), 2, np.int32)
        temps_np = np.zeros((self.max_batch,), np.float32)
        topks_np = np.zeros((self.max_batch,), np.int32)
        uids_np = np.zeros((self.max_batch,), np.int32)
        emit0_np = np.zeros((self.max_batch,), np.int32)
        for i in active:
            req = self.slot_req[i]
            toks = req.prompt + req.out_tokens
            hist[i, : len(toks)] = toks
            valid[i] = len(toks)  # == lengths[i] + 1
            uids_np[i] = req.uid
            emit0_np[i] = len(req.out_tokens)
            if req.temperature > 0:
                temps_np[i] = req.temperature
                topks_np[i] = req.top_k
        sample_args = None
        topk_cap = 0
        if temps_np.any():
            row_keys = _spec_row_keys(self._spec_key, jnp.asarray(uids_np))
            sample_args = (
                jnp.asarray(emit0_np), row_keys, jnp.asarray(temps_np),
                jnp.asarray(topks_np),
            )
            topk_cap = self.topk_cap
        lids = jnp.asarray(self.lora_ids) if self._lora_banked else None
        out, counts, self.caches, _rounds = self._backend.spec_window(
            jnp.asarray(hist),
            jnp.asarray(valid),
            jnp.asarray(self.next_token),
            jnp.asarray(np.maximum(self.lengths, 1), jnp.int32),
            self.caches,
            window,
            k,
            lora_ids=lids,
            sample_args=sample_args,
            topk_cap=topk_cap,
        )
        out_np = self._backend.fetch(out)  # the window's single host fetch
        counts_np = self._backend.fetch(counts)
        for i in active:
            for j in range(int(counts_np[i])):
                if self.slot_req[i] is None:
                    break  # finished mid-window; rest is garbage
                t = int(out_np[i, j])
                self.lengths[i] += 1
                self.next_token[i] = t
                self._commit(i, t)

    def step(self) -> None:
        """One scheduler step: admit queued requests into free slots (one
        grouped prefill — up to dp rows at once under DP), then advance all
        active slots by a decode window IN THE SAME STEP (prefill no longer
        stalls the decode round for running slots)."""
        if self._chunking is not None:
            # in-flight chunked prefill: one chunk per step (decode below
            # still advances the running slots)
            self._chunk_step()
        elif self.queue:
            head = self.queue[0]
            if self._chunk_eligible(head):
                slot = self._free_slot()
                if slot is not None:
                    self.queue.popleft()
                    self._start_chunked(slot, head)
            else:
                rows = self._backend.prefill_rows
                assignments = []
                for row in range(rows):  # under DP: scratch row i -> shard i
                    if not self.queue:
                        break
                    if self._chunk_eligible(self.queue[0]):
                        # leave a chunk-eligible prompt at the HEAD for the
                        # next step's chunk branch — admitting it here via
                        # the grouped prefill would stall all running
                        # slots for the whole long prompt (defeating
                        # prefill_chunk's bounded head-of-line-latency
                        # contract) and run a grouped program warmup()
                        # never compiled for that bucket
                        break
                    slot = next(
                        (
                            s
                            for s in self._backend.slots_for_row(
                                row, self.max_batch
                            )
                            if self.slot_req[s] is None
                        ),
                        None,
                    )
                    if slot is None:
                        continue
                    req = self.queue.popleft()
                    assignments.append((row, slot, req))
                    self.slot_req[slot] = req  # reserve
                if assignments:
                    self._prefill_group(assignments)
        # active = prefilled slots only (lengths > 0); a slot reserved by an
        # in-flight chunked prefill has lengths 0 and must not decode
        active = [
            i
            for i, s in enumerate(self.slot_req)
            if s is not None and self.lengths[i] > 0
        ]
        if not active:
            return
        # Multi-step decode window: amortize the host round-trip over
        # several decode iterations. ALWAYS the full fixed window (one
        # compiled program — per-remaining-budget window sizes would
        # recompile the scanned step at every distinct size); tokens past a
        # slot's budget/eos are discarded and its cache rows beyond are
        # garbage-tolerant (overwritten before ever being read on slot
        # reuse). Sampled slots ride the same window: their per-slot
        # PRNG/temperature/top-k runs device-side inside the scan.
        # Single-step only when a queued request could actually be admitted
        # next round (free slot exists — bounded admission latency).
        window = 1
        if self.decode_window > 1 and (
            not self.queue or self._free_slot() is None
        ):
            window = self.decode_window
        if self.spec_ngram is not None and (
            window > 1
            or any(self.slot_req[i].temperature > 0 for i in active)
        ):
            # speculative decode window: n-gram drafts + one multi-token
            # verify per round instead of sequential steps. Greedy-exact;
            # sampled rows draw their targets with per-request POSITIONAL
            # keys (window-size-invariant streams). Greedy-only window=1
            # rounds fall through to the plain step (a verify would cost
            # the same round-trip for no amortization); sampled rows must
            # stay on the positional sampler even at window 1 so their
            # stream never mixes PRNG derivations.
            self._spec_decode_window(active, window)
            return
        # per-slot sampling params ([B] vectors; inactive slots greedy)
        temps_np = np.zeros((self.max_batch,), np.float32)
        topks_np = np.zeros((self.max_batch,), np.int32)
        for i in active:
            r = self.slot_req[i]
            if r.temperature > 0:
                temps_np[i] = r.temperature
                topks_np[i] = r.top_k
        sample = bool(temps_np.any())
        # CHAIN several windows back-to-back when slot retirement is
        # host-predictable: batch full (an arrival can't be admitted
        # anyway), queue empty, and no active request can hit EOS — then
        # the only retirements are budget exhaustion, known in advance.
        # The carries (next token/lengths/PRNG key) stay ON DEVICE between
        # windows; the async dispatches pipeline behind the ~26 ms relay
        # and ONE fetch at the end collects every window's tokens — decode
        # between admissions runs at static-batch speed.
        chain = 1
        if (
            window > 1
            and self.max_chain > 1
            and not self.queue
            and self._chunking is None  # a chunked prefill advances one
            # chunk per step(); chaining would multiply its TTFT by chain
            and self._free_slot() is None
            and all(self.slot_req[i].eos_token_id is None for i in active)
        ):
            min_rem = min(
                self.slot_req[i].max_new_tokens
                - len(self.slot_req[i].out_tokens)
                for i in active
            )
            chain = max(1, min(-(-min_rem // window), self.max_chain))
        if self.paged:
            # every active slot needs blocks covering this round's writes
            # (window overshoot included), and retired slots' table rows
            # must point at the trash block before the dispatch
            for i in active:
                self._alloc_blocks(i, int(self.lengths[i]) + window * chain)
            self._sync_tables()
        lengths = jnp.asarray(np.maximum(self.lengths, 1), jnp.int32)
        tokens = jnp.asarray(self.next_token[:, None], jnp.int32)
        lids = jnp.asarray(self.lora_ids) if self._lora_banked else None
        if window > 1:
            self._key, sub = jax.random.split(self._key)
            temps = jnp.asarray(temps_np)
            topks = jnp.asarray(topks_np)
            parts = []
            tok_d, len_d, key_d = tokens, lengths, sub
            for _ in range(chain):
                toks, tok_d, len_d, key_d, self.caches = (
                    self._backend.decode_multi(
                        tok_d, len_d, self.caches, window, key_d, temps,
                        topks, sample=sample,
                        topk_cap=self.topk_cap if sample else 0,
                        lora_ids=lids,
                    )
                )
                parts.append(toks)
            toks_np = self._backend.fetch(
                parts[0] if chain == 1 else jnp.concatenate(parts, axis=1)
            )  # [B, window * chain] — the chain's single host fetch
            for i in active:
                for j in range(window * chain):
                    if self.slot_req[i] is None:
                        break  # finished mid-window; rest is garbage
                    t = int(toks_np[i, j])
                    self.lengths[i] += 1
                    self.next_token[i] = t
                    self._commit(i, t)
            return
        # inactive slots decode garbage at a safe position; their output is
        # never committed and their cache rows are overwritten on reuse.
        logits, self.caches = self._backend.decode(
            tokens, lengths, self.caches, lora_ids=lids
        )
        if isinstance(self._backend, _ShardedBackend) and jax.process_count() > 1:
            # multi-process: the data-sharded logits can't feed the local
            # sampler directly — allgather first (identical on every
            # process, so the sampled tokens stay in lockstep)
            logits = jnp.asarray(self._backend.fetch(logits))
        self._key, sub = jax.random.split(self._key)
        # one sampler for both cases (zero temps == greedy) so a sampling
        # fix can never make the single-step and windowed paths disagree
        toks_np = np.asarray(
            _sample_rows_jit(
                logits, sub, jnp.asarray(temps_np), jnp.asarray(topks_np),
                topk_cap=self.topk_cap if sample else 0,
            )
        )
        for i in active:
            self.lengths[i] += 1
            tok = int(toks_np[i])
            self.next_token[i] = tok
            self._commit(i, tok)

    def run(self, max_steps: int | None = None) -> None:
        steps = 0
        while self.has_work:
            self.step()
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break

    def generate_all(self, prompts, max_new_tokens: int, **kw) -> list[list[int]]:
        """Convenience: submit a batch of prompts, run to completion, return
        outputs in submission order."""
        uids = [self.add_request(p, max_new_tokens, **kw) for p in prompts]
        self.run()
        return [self.result(u) for u in uids]
