"""Random-weight model construction (fp16-equivalent bf16 "reference model")
and its quantization to W8A16 params.

Used by tests and benchmarks: the environment has no network access, so
benchmark models are built from the real configs with random weights — the
compute/bandwidth profile is identical to real checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eetq_tpu.models.config import ModelConfig
from eetq_tpu.models.transformer import LayerParams, ModelParams
from eetq_tpu.modules.linear import DenseLinear, quantize_linear


def _dense(key, k, n, dtype) -> DenseLinear:
    w = jax.random.normal(key, (k, n), jnp.float32) * (k**-0.5)
    return DenseLinear(weight=w.astype(dtype))


def random_dense_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16
) -> ModelParams:
    """Unquantized (bf16) model with fused qkv / gateup linears."""
    n_keys = cfg.num_layers * 4 + 2
    keys = iter(jax.random.split(key, n_keys))
    h = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            LayerParams(
                input_norm=jnp.ones((h,), jnp.float32),
                qkv=_dense(next(keys), h, cfg.qkv_out, dtype),
                o_proj=_dense(next(keys), cfg.num_heads * cfg.head_dim, h, dtype),
                post_norm=jnp.ones((h,), jnp.float32),
                gateup=_dense(next(keys), h, 2 * cfg.intermediate_size, dtype),
                down=_dense(next(keys), cfg.intermediate_size, h, dtype),
            )
        )
    embed = jax.random.normal(next(keys), (cfg.vocab_size, h), jnp.float32) * 0.02
    lm_head = (
        None
        if cfg.tie_word_embeddings
        else _dense(next(keys), h, cfg.vocab_size, dtype)
    )
    return ModelParams(
        embed=embed.astype(dtype),
        layers=layers,
        final_norm=jnp.ones((h,), jnp.float32),
        lm_head=lm_head,
    )


def quantize_params(params: ModelParams, bits: int = 8) -> ModelParams:
    """One-line quantize-and-swap over a params pytree: every DenseLinear in
    the decoder layers becomes a QuantLinear (per-channel symmetric W8A16).
    The lm_head stays dense, matching the reference's exclusion
    (`utils/base.py:273-274`: get_named_linears excludes lm_head)."""

    def q(lin: DenseLinear):
        return quantize_linear(lin.weight, bias=lin.bias, bits=bits)

    layers = [
        dataclasses_replace(
            lp,
            qkv=q(lp.qkv),
            o_proj=q(lp.o_proj),
            gateup=q(lp.gateup),
            down=q(lp.down),
        )
        for lp in params.layers
    ]
    return dataclasses_replace(params, layers=layers)


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)
