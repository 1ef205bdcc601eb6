"""Flash-decode kernel vs the XLA decode-attention oracle: bf16 and int8
caches, scalar and per-row lengths, GQA/MHA, sliding window, length
clamping (blocks past `length` must not affect output)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.kernels.flash_decode import flash_decode
from eetq_tpu.modules.attention import (
    KVCache,
    attention,
    attention_decode_ref,
    init_kv_cache,
)


def _filled_cache(rng, b, hkv, d, max_len, n, dtype=jnp.bfloat16):
    cache = init_kv_cache(b, max_len, hkv, d, dtype=dtype)
    k = jnp.asarray(rng.standard_normal((b, n, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    from eetq_tpu.modules.attention import update_cache

    return update_cache(cache, k, v, 0)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4), (4, 1)])
def test_matches_oracle(rng, dtype, hq, hkv):
    b, d, max_len, n = 2, 64, 256, 100
    cache = _filled_cache(rng, b, hkv, d, max_len, n, dtype)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out = flash_decode(q, cache, n, block_l=128, interpret=True)
    ref = attention_decode_ref(q, cache, n, None, 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_per_row_lengths(rng):
    b, hq, hkv, d, max_len = 3, 4, 2, 32, 256
    cache = _filled_cache(rng, b, hkv, d, max_len, 200)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    lengths = jnp.asarray([7, 130, 200], jnp.int32)
    out = flash_decode(q, cache, lengths, block_l=128, interpret=True)
    ref = attention_decode_ref(q, cache, lengths, None, 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_poison_beyond_length_ignored(rng):
    b, hq, hkv, d, max_len, n = 1, 4, 2, 32, 256, 60
    cache = _filled_cache(rng, b, hkv, d, max_len, n)
    poison = KVCache(
        k=cache.k.at[:, :, n:].set(30000.0), v=cache.v.at[:, :, n:].set(30000.0)
    )
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out_c = flash_decode(q, cache, n, block_l=64, interpret=True)
    out_p = flash_decode(q, poison, n, block_l=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_p))


def test_sliding_window(rng):
    b, hq, hkv, d, max_len, n = 1, 4, 2, 32, 256, 180
    cache = _filled_cache(rng, b, hkv, d, max_len, n)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out = flash_decode(q, cache, n, window=64, block_l=64, interpret=True)
    ref = attention_decode_ref(q, cache, n, 64, 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_attention_entry_uses_kernel_path(rng):
    """attention() decode path routes through flash_decode on TPU and
    matches the oracle in interpret mode too (use_kernel asserted off on
    CPU by default — force both and compare)."""
    from eetq_tpu.modules.attention import attention_decode

    b, hq, hkv, d, max_len, n = 1, 4, 2, 32, 128, 40
    cache = _filled_cache(rng, b, hkv, d, max_len, n)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out_k = attention_decode(q, cache, n, use_kernel=True)
    out_x = attention_decode(q, cache, n, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        atol=2e-2, rtol=2e-2,
    )


# ---- multi-query (speculative-decode verify) mode ----


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4)])
def test_multiquery_matches_verify_oracle(rng, dtype, hq, hkv):
    from eetq_tpu.modules.attention import attention_verify_ref

    b, s, d, max_len, n = 2, 5, 64, 256, 100
    cache = _filled_cache(rng, b, hkv, d, max_len, n, dtype)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out = flash_decode(q, cache, n, block_l=128, interpret=True)
    ref = attention_verify_ref(q, cache, n, None, 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_multiquery_bitwise_vs_single_token(rng):
    """THE spec-decoding guarantee: verify row i must be BITWISE equal to a
    single-token call at length - S + i + 1 (same cache -> same block
    schedule -> same per-row accumulation order)."""
    b, s, hq, hkv, d, max_len, n = 2, 4, 4, 2, 32, 256, 100
    cache = _filled_cache(rng, b, hkv, d, max_len, n)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    out = flash_decode(q, cache, n, block_l=128, interpret=True)
    for i in range(s):
        single = flash_decode(
            q[:, i : i + 1], cache, n - s + i + 1, block_l=128, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(out[:, i : i + 1]), np.asarray(single)
        )


def test_multiquery_per_row_lengths_window(rng):
    """Per-row lengths + sliding window: fully-masked visited blocks must
    contribute exactly nothing (the p-masking path)."""
    from eetq_tpu.modules.attention import attention_verify_ref

    b, s, hq, hkv, d, max_len = 2, 4, 4, 2, 32, 256
    cache = _filled_cache(rng, b, hkv, d, max_len, 220)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    lengths = jnp.asarray([9, 220], jnp.int32)
    for window in (None, 64):
        out = flash_decode(q, cache, lengths, window=window, block_l=64,
                           interpret=True)
        ref = attention_verify_ref(q, cache, lengths, window, 1.0 / d**0.5)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_multiquery_alibi(rng):
    from eetq_tpu.modules.attention import attention_verify_ref
    from eetq_tpu.ops.alibi import alibi_slopes

    b, s, hq, hkv, d, max_len, n = 1, 3, 4, 2, 32, 256, 90
    cache = _filled_cache(rng, b, hkv, d, max_len, n)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    slopes = jnp.asarray(alibi_slopes(hq), jnp.float32)
    out = flash_decode(q, cache, n, block_l=64, interpret=True, slopes=slopes)
    ref = attention_verify_ref(q, cache, n, None, 1.0 / d**0.5, slopes=slopes)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
