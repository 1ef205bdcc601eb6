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
    out_tokens: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


@functools.partial(jax.jit, static_argnames=("cfg", "bucket", "a8"))
def _prefill_bucketed(params, cfg: ModelConfig, tokens, true_len, bucket: int,
                      caches, a8: bool = False):
    """Prefill one request padded to `bucket`. tokens [1, bucket]; caches are
    single-row [1, max_len] scratch. Returns (last REAL token's logits
    [V], caches). Right-padding is inert: causal masking means real tokens
    never attend to later (padded) positions, and padded cache rows beyond
    true_len are never read during decode (per-row length masking)."""
    s = tokens.shape[1]
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (1, s))
    logits, caches = forward_inner(
        params, cfg, tokens, positions, caches, jnp.int32(0), a8=a8
    )
    last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, axis=0,
                                        keepdims=False)
    return last, caches


@functools.partial(
    jax.jit, static_argnames=("cfg", "decode_kernel"), donate_argnames=("caches",)
)
def _decode_batch(params, cfg: ModelConfig, tokens, lengths, caches,
                  decode_kernel: bool = False):
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
        decode_kernel=decode_kernel,
    )
    return logits[:, -1, :], caches


class _ShardedBackend:
    """Forward backend for a TP-sharded model (eetq_tpu.dist.ShardedModel).

    Runs the engine's prefill/decode through shard_map'd TP forwards:
    tensor parallelism only (requires dp == 1 — prefill is batch-1 and slot
    batching is lock-step, so the data axis must be trivial)."""

    def __init__(self, model):
        from eetq_tpu.dist.sharding import DATA_AXIS, make_forward_fn

        if model.mesh.shape[DATA_AXIS] != 1:
            raise ValueError("sharded Engine requires a dp=1 (pure TP) mesh")
        self.model = model
        self.params = model.params
        self.cfg = model.cfg
        self._fwd_scalar = make_forward_fn(model)
        self._fwd_rows = make_forward_fn(model, per_row_offset=True)

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

    def prefill(self, tokens, true_len, bucket, caches):
        s = tokens.shape[1]
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (1, s))
        logits, caches = self._fwd_scalar(
            self.params, tokens, positions, caches, jnp.int32(0)
        )
        last = jax.lax.dynamic_index_in_dim(
            logits[0], true_len - 1, axis=0, keepdims=False
        )
        return last, caches

    def decode(self, tokens, lengths, caches):
        logits, caches = self._fwd_rows(
            self.params, tokens, lengths[:, None], caches, lengths
        )
        return logits[:, -1, :], caches


class _LocalBackend:
    """Forward backend for single-device (params, cfg)."""

    def __init__(self, params, cfg, a8_prefill: bool = False):
        self.params = params
        self.cfg = cfg
        self.a8_prefill = a8_prefill

    def place_caches(self, caches):
        return caches

    def prefill(self, tokens, true_len, bucket, caches):
        return _prefill_bucketed(
            self.params, self.cfg, tokens, true_len, bucket, caches,
            a8=self.a8_prefill,
        )

    def decode(self, tokens, lengths, caches):
        return _decode_batch(
            self.params, self.cfg, tokens, lengths, caches,
            decode_kernel=jax.default_backend() == "tpu",
        )


@functools.partial(
    jax.jit, static_argnames=("upto_pad",), donate_argnames=("big",)
)
def _insert_rows(big: KVCache, small: KVCache, slot, upto_pad: int):
    """Copy small[0, :, :upto_pad] into big[slot, :, :upto_pad] (one slot
    row, first upto_pad sequence positions). Generic over cache leaves:
    4-D [B, H, L, D] k/v arrays and 3-D [B, H, L] int8-cache scale arrays
    both have the sequence on axis 2."""

    def ins(b, s):
        upd = jax.lax.slice_in_dim(s, 0, upto_pad, axis=2).astype(b.dtype)
        start = (slot,) + (0,) * (b.ndim - 1)
        return jax.lax.dynamic_update_slice(b, upd, start)

    return jax.tree.map(ins, big, small)


@functools.partial(jax.jit, static_argnames=("cfg", "temperature", "top_k"))
def _sample_batch(logits, key, cfg, temperature: float, top_k: int):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


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
        kv_dtype=jnp.bfloat16,
        seed: int = 0,
        a8_prefill: bool = False,
    ):
        # `params` may be a plain ModelParams (with cfg) or a TP-sharded
        # model (eetq_tpu.dist.ShardedModel; cfg comes from it).
        # a8_prefill runs prefills through the W8A8 int8-activation path
        # (2x MXU; small extra quantization error) — local backend only.
        if cfg is None:
            if a8_prefill:
                raise ValueError("a8_prefill is not supported for sharded models yet")
            self._backend = _ShardedBackend(params)
            params, cfg = self._backend.params, self._backend.cfg
        else:
            self._backend = _LocalBackend(params, cfg, a8_prefill=a8_prefill)
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = min(max_len, cfg.max_position)
        self.buckets = tuple(
            sorted(b for b in prompt_buckets if b <= self.max_len)
        ) or (self.max_len,)
        self.kv_dtype = kv_dtype
        self.caches = self._backend.place_caches(
            init_caches(cfg, max_batch, self.max_len, kv_dtype)
        )
        self._key = jax.random.PRNGKey(seed)
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
    ) -> int:
        prompt = [int(t) for t in np.asarray(prompt).ravel()]
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_len {self.max_len}"
            )
        r = Request(
            uid=next(self._uid),
            prompt=prompt,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_k=top_k,
            eos_token_id=eos_token_id,
        )
        self.queue.append(r)
        self.requests[r.uid] = r
        return r.uid

    def result(self, uid: int) -> list[int]:
        r = self.requests[uid]
        if not r.done:
            raise ValueError(f"request {uid} not finished")
        return r.out_tokens

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slot_req)

    # ---- scheduling ----

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

    def _prefill_one(self, slot: int, req: Request) -> None:
        n = len(req.prompt)
        bucket = self._bucket_for(n)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = req.prompt
        scratch = self._backend.place_caches(
            init_caches(self.cfg, 1, self.max_len, self.kv_dtype)
        )
        logits, scratch = self._backend.prefill(
            jnp.asarray(toks), jnp.int32(n), bucket, scratch
        )
        upto = min(bucket, self.max_len)
        self.caches = [
            _insert_rows(big, small, jnp.int32(slot), upto)
            for big, small in zip(self.caches, scratch)
        ]
        self._key, sub = jax.random.split(self._key)
        tok = int(
            _sample_batch(logits[None], sub, self.cfg, req.temperature,
                          req.top_k)[0]
        )
        self.slot_req[slot] = req
        self.lengths[slot] = n
        self.next_token[slot] = tok
        self._commit(slot, tok)

    def _commit(self, slot: int, tok: int) -> None:
        """Append a sampled token to the slot's request; retire if done."""
        req = self.slot_req[slot]
        req.out_tokens.append(tok)
        hit_eos = req.eos_token_id is not None and tok == req.eos_token_id
        if hit_eos or len(req.out_tokens) >= req.max_new_tokens:
            req.done = True
            self.slot_req[slot] = None
            self.lengths[slot] = 0

    def step(self) -> None:
        """One scheduler step: admit a queued request into a free slot
        (prefill), else advance all active slots by one decode step."""
        if self.queue:
            slot = self._free_slot()
            if slot is not None:
                self._prefill_one(slot, self.queue.popleft())
                return
        active = [i for i, s in enumerate(self.slot_req) if s is not None]
        if not active:
            return
        # inactive slots decode garbage at a safe position; their output is
        # never committed and their cache rows are overwritten on reuse.
        lengths = jnp.asarray(np.maximum(self.lengths, 1), jnp.int32)
        tokens = jnp.asarray(self.next_token[:, None], jnp.int32)
        logits, self.caches = self._backend.decode(tokens, lengths, self.caches)
        self._key, sub = jax.random.split(self._key)
        # temperature/top_k are per-request; sample greedily in one batch
        # for the common case, individually for sampled requests.
        greedy = _sample_batch(logits, sub, self.cfg, 0.0, 0)
        greedy_np = np.asarray(greedy)
        sampled_np = greedy_np
        if any(
            self.slot_req[i] is not None and self.slot_req[i].temperature > 0
            for i in active
        ):
            keys = jax.random.split(sub, self.max_batch)
            sampled_rows = {}
            for i in active:
                r = self.slot_req[i]
                if r.temperature > 0:
                    sampled_rows[i] = int(
                        _sample_batch(
                            logits[i][None], keys[i], self.cfg,
                            r.temperature, r.top_k,
                        )[0]
                    )
            sampled_np = greedy_np.copy()
            for i, t in sampled_rows.items():
                sampled_np[i] = t
        for i in active:
            self.lengths[i] += 1
            tok = int(sampled_np[i])
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
