"""Long-context serving: sequence-parallel prefill over an ICI ring.

The reference's max context is one GPU's flash-attn memory with a hardcoded
2048-position cache (`modules/llama_modules.py:20,89`; SURVEY.md §5). Here
long prompts are prefilled SEQUENCE-SHARDED: each device in the mesh axis
owns S/p contiguous prompt tokens, runs every layer on its local chunk
(weights replicated over the axis), and attention runs as ring attention
(`dist/ring_attention.py` — KV shards rotate over ICI `ppermute`, online
softmax merges). Peak activation memory per device is O(S/p); no [S, S]
score block and no full-S activations ever exist on one chip.

After prefill the per-layer K/V chunks are all-gathered into the standard
dense decode cache (decode needs every key anyway) and generation proceeds
through the ordinary single-device decode loop.

Entry points:
  - `long_prefill(params, cfg, tokens, mesh)` -> (last_logits, caches)
  - `generate_long(params, cfg, prompt, max_new_tokens, mesh)` — prefill
    sequence-parallel, then the scanned decode loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from eetq_tpu.dist.ring_attention import ring_attention
from eetq_tpu.dist.sharding import MODEL_AXIS
from eetq_tpu.models.config import ModelConfig
from eetq_tpu.models.transformer import ModelParams, init_caches
from eetq_tpu.modules.attention import update_cache
from eetq_tpu.modules.linear import linear_apply
from eetq_tpu.ops import make_cos_sin_cache, rmsnorm, rope


def _norm(x, gamma, cfg: ModelConfig):
    if cfg.rmsnorm_unit_offset:
        gamma = gamma + 1.0
    return rmsnorm(x, gamma, eps=cfg.rms_eps)


def _sp_forward_local(params, tokens_local, *, cfg: ModelConfig, axis_name):
    """Per-device body (inside shard_map): full decoder forward on the local
    sequence chunk with ring attention; returns (last-token logits [B, V]
    replicated, list of local (k, v) [B, s_local, Hkv, D])."""
    b, s_local = tokens_local.shape
    p = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    positions = (
        idx * s_local + jnp.arange(s_local, dtype=jnp.int32)
    )[None, :].repeat(b, axis=0)

    x = params.embed[tokens_local].astype(jnp.bfloat16)
    if cfg.embedding_multiplier is not None:
        x = (x.astype(jnp.float32) * cfg.embedding_multiplier).astype(x.dtype)
    cos_sin = make_cos_sin_cache(cfg.max_position, cfg.rot_dim, base=cfg.rope_theta)

    hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    slopes = None
    if cfg.alibi:
        from eetq_tpu.ops.alibi import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(cfg.num_heads))
    kv_chunks = []
    for layer in params.layers:
        residual = x
        y = _norm(x, layer.input_norm, cfg)
        qkv = linear_apply(layer.qkv, y)
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
        q = q.reshape(b, s_local, hq, d)
        k = k.reshape(b, s_local, hkv, d)
        v = v.reshape(b, s_local, hkv, d)
        if not cfg.alibi:
            q = rope(q, positions, cos_sin, interleaved=cfg.rope_interleaved)
            k = rope(k, positions, cos_sin, interleaved=cfg.rope_interleaved)
        kv_chunks.append((k, v))
        attn = ring_attention(
            q, k, v, axis_name=axis_name, causal=True, slopes=slopes,
            window=cfg.sliding_window,
        )
        o = linear_apply(layer.o_proj, attn.reshape(b, s_local, hq * d))
        x = residual + o

        residual = x
        y = _norm(x, layer.post_norm, cfg)
        gateup = linear_apply(layer.gateup, y)
        gate, up = jnp.split(gateup, 2, axis=-1)
        act = {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu}[
            cfg.activation
        ]
        h = (act(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)
        x = residual + linear_apply(layer.down, h)

    # logits for the LAST local token only (the global last token lives on
    # device p-1; all-gather the per-device candidates and pick the last)
    x_last = _norm(x[:, -1:], params.final_norm, cfg)
    if params.lm_head is not None:
        logits = linear_apply(params.lm_head, x_last)
    else:
        logits = jnp.dot(
            x_last, params.embed.T.astype(x_last.dtype),
            preferred_element_type=jnp.float32,
        )
    logits = logits.astype(jnp.float32)  # [B, 1, V]
    all_last = jax.lax.all_gather(logits[:, 0], axis_name, axis=0)  # [p, B, V]
    last = all_last[p - 1]  # replicated

    # gather each layer's KV chunks into full [B, S, Hkv, D] (replicated)
    full_kv = [
        (
            jax.lax.all_gather(k, axis_name, axis=1, tiled=True),
            jax.lax.all_gather(v, axis_name, axis=1, tiled=True),
        )
        for k, v in kv_chunks
    ]
    return last, full_kv


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "axis_name", "max_len", "kv_dtype")
)
def long_prefill(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, S]
    mesh: Mesh,
    axis_name: str = MODEL_AXIS,
    max_len: int | None = None,
    kv_dtype=jnp.bfloat16,
):
    """Sequence-parallel prefill. Params must be REPLICATED across
    `axis_name` (sequence parallelism trades activation memory, not weight
    memory; combine with a `data` axis for batch).

    Returns (last-token logits [B, V] f32, dense decode caches at max_len
    (default: rounded S) ready for `serve.generate.decode_loop`)."""
    from jax import shard_map

    if any(lp.moe is not None for lp in params.layers):
        raise NotImplementedError(
            "ring attention (sequence-parallel prefill) not supported for "
            "MoE layers"
        )
    b, s = tokens.shape
    p = mesh.shape[axis_name]
    if s % p:
        raise ValueError(f"prompt length {s} must divide the {axis_name} "
                         f"axis size {p} (pad the prompt)")

    # run under Auto axis types: Explicit-mode meshes (jax.make_mesh's
    # default) would tag the gathered outputs with explicit shardings that
    # refuse to mix with the unsharded decode-cache buffers below
    from jax.sharding import AxisType

    auto_mesh = Mesh(
        mesh.devices, mesh.axis_names,
        axis_types=(AxisType.Auto,) * len(mesh.axis_names),
    )
    specs = jax.tree.map(lambda _: P(), params)
    fn = shard_map(
        functools.partial(
            _sp_forward_local, cfg=cfg, axis_name=axis_name
        ),
        mesh=auto_mesh,
        in_specs=(specs, P(None, axis_name)),
        out_specs=(P(), [(P(), P())] * cfg.num_layers),
        check_vma=False,
    )
    last, full_kv = fn(params, tokens)

    max_len = max_len or s
    caches = init_caches(cfg, b, max_len, dtype=kv_dtype)
    caches = [
        update_cache(c, k, v, jnp.int32(0))
        for c, (k, v) in zip(caches, full_kv)
    ]
    return last, caches


def generate_long(
    params: ModelParams,
    cfg: ModelConfig,
    prompt: jax.Array,  # [B, S]
    max_new_tokens: int,
    mesh: Mesh,
    axis_name: str = MODEL_AXIS,
    temperature: float = 0.0,
    top_k: int = 0,
    key: jax.Array | None = None,
    eos_token_id: int | None = None,
    kv_dtype=jnp.bfloat16,
) -> jax.Array:
    """Long-context generation: sequence-parallel ring-attention prefill,
    then the standard scanned decode loop. Returns [B, max_new_tokens]."""
    from eetq_tpu.serve.generate import _sample, decode_loop

    b, s = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    logits, caches = long_prefill(
        params, cfg, prompt, mesh, axis_name=axis_name,
        max_len=s + max_new_tokens, kv_dtype=kv_dtype,
    )
    key, sub = jax.random.split(key)
    token = _sample(logits, sub, cfg, temperature, top_k)
    toks, _ = decode_loop(
        params, cfg, token, jnp.int32(s), caches, max_new_tokens,
        temperature=temperature, top_k=top_k, key=key,
        eos_token_id=eos_token_id,
    )
    return toks
