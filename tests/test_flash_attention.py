"""Flash-attention kernel vs masked-softmax oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.kernels.flash_attention import flash_attention
from eetq_tpu.modules.attention import attention_reference, causal_mask


def _qkv(rng, b, s, hq, hkv, d, skv=None):
    skv = skv or s
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize(
    "b,s,hq,hkv,d",
    [
        (1, 128, 4, 4, 64),    # MHA
        (2, 256, 8, 2, 64),    # GQA 4:1
        (1, 300, 4, 1, 128),   # MQA, unaligned seq
        (1, 8, 4, 4, 64),      # tiny seq (below one block)
    ],
)
def test_causal_matches_reference(rng, b, s, hq, hkv, d):
    q, k, v = _qkv(rng, b, s, hq, hkv, d)
    scale = 1.0 / d**0.5
    out = flash_attention(q, k, v, causal=True)
    ref = attention_reference(q, k, v, causal_mask(s), scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_non_causal(rng):
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64)
    out = flash_attention(q, k, v, causal=False)
    ref = attention_reference(q, k, v, None, 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_sliding_window(rng):
    s, w = 256, 64
    q, k, v = _qkv(rng, 1, s, 4, 4, 64)
    out = flash_attention(q, k, v, causal=True, window=w)
    ref = attention_reference(q, k, v, causal_mask(s, window=w), 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_bf16(rng):
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, k, v, causal_mask(128), 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=2e-2
    )


def test_cross_attention_lengths(rng):
    """Sq != Skv (chunked prefill shape)."""
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64, skv=384)
    out = flash_attention(q, k, v, causal=False)
    ref = attention_reference(q, k, v, None, 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )
