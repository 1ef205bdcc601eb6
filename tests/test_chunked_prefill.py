"""Chunked prefill: prefilling a prompt in fixed chunks (each chunk
attending over the cached prefix) must reproduce full-prompt prefill —
logits and caches. Covers sliding window, ALiBi, int8 KV, and that decode
continues correctly after a chunked prefill."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.models.transformer import init_caches
from eetq_tpu.serve.generate import (
    decode_loop,
    greedy_generate,
    prefill,
    prefill_chunked,
)

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=256,
)


@pytest.fixture(scope="module")
def params():
    return quantize_params(
        random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )


def _toks(b, s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(1, CFG.vocab_size, size=(b, s)), jnp.int32)


@pytest.mark.parametrize("chunk", [16, 32])
def test_chunked_matches_full(params, chunk):
    toks = _toks(2, 64)
    lg_full, c_full = prefill(params, CFG, toks, init_caches(CFG, 2, 128))
    lg_ch, c_ch = prefill_chunked(
        params, CFG, toks, init_caches(CFG, 2, 128), chunk=chunk
    )
    np.testing.assert_allclose(
        np.asarray(lg_ch), np.asarray(lg_full), atol=0.05
    )
    for a, b in zip(c_ch, c_full):
        np.testing.assert_allclose(
            np.asarray(a.k[:, :, :64], np.float32),
            np.asarray(b.k[:, :, :64], np.float32),
            atol=0.05,
        )


def test_chunked_sliding_window(params):
    cfg = dataclasses.replace(CFG, sliding_window=24)
    toks = _toks(1, 64, seed=1)
    lg_full, _ = prefill(params, cfg, toks, init_caches(cfg, 1, 128))
    lg_ch, _ = prefill_chunked(
        params, cfg, toks, init_caches(cfg, 1, 128), chunk=16
    )
    np.testing.assert_allclose(np.asarray(lg_ch), np.asarray(lg_full),
                               atol=0.05)


def test_chunked_alibi():
    cfg = dataclasses.replace(CFG, alibi=True, num_kv_heads=4,
                              model_type="baichuan")
    p = quantize_params(
        random_dense_params(cfg, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    )
    toks = _toks(1, 64, seed=2)
    lg_full, _ = prefill(p, cfg, toks, init_caches(cfg, 1, 128))
    lg_ch, _ = prefill_chunked(p, cfg, toks, init_caches(cfg, 1, 128), chunk=16)
    np.testing.assert_allclose(np.asarray(lg_ch), np.asarray(lg_full),
                               atol=0.05)


def test_chunked_int8_kv(params):
    toks = _toks(1, 64, seed=3)
    lg_full, _ = prefill(
        params, CFG, toks, init_caches(CFG, 1, 128, dtype=jnp.int8)
    )
    lg_ch, _ = prefill_chunked(
        params, CFG, toks, init_caches(CFG, 1, 128, dtype=jnp.int8), chunk=32
    )
    # int8 requantization error compounds slightly chunk-to-chunk
    np.testing.assert_allclose(np.asarray(lg_ch), np.asarray(lg_full),
                               atol=0.15)


def test_decode_after_chunked_prefill(params):
    """Chunked prefill then the scanned decode loop == greedy_generate."""
    s, n = 32, 8
    toks = _toks(1, s, seed=4)
    want = greedy_generate(params, CFG, toks, n)
    logits, caches = prefill_chunked(
        params, CFG, toks, init_caches(CFG, 1, s + n), chunk=16
    )
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    got, _ = decode_loop(params, CFG, tok, jnp.int32(s), caches, n)
    assert [int(t) for t in np.asarray(got[0])] == [
        int(t) for t in np.asarray(want[0])
    ]


def test_rejects_non_multiple(params):
    with pytest.raises(ValueError):
        prefill_chunked(params, CFG, _toks(1, 60), init_caches(CFG, 1, 128),
                        chunk=16)
