"""Ring attention (sequence-sharded over an ICI ring) vs the full-attention
oracle — the long-context layer the reference lacks (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.dist.ring_attention import ring_attention_sharded
from eetq_tpu.modules.attention import attention_reference, causal_mask

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices"
)


def _mesh(p):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:p]).reshape(1, p), ("data", "model"))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_matches_full_attention(rng, causal, hq, hkv):
    p = 4
    b, s, d = 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    out = ring_attention_sharded(q, k, v, _mesh(p), causal=causal)
    mask = causal_mask(s) if causal else None
    ref = attention_reference(q, k, v, mask, 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_eight_way(rng):
    p = 8
    if len(jax.devices()) < p:
        pytest.skip("needs 8 devices")
    b, s, hq, hkv, d = 1, 128, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(1, p), ("data", "model"))
    out = ring_attention_sharded(q, k, v, mesh)
    ref = attention_reference(q, k, v, causal_mask(s), 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_sliding_window_matches_full(rng):
    """Ring attention with a sliding window == windowed full attention;
    the window crosses chunk boundaries (w=24 over 16-token chunks)."""
    p = 4
    b, s, hq, hkv, d, w = 2, 64, 4, 2, 16, 24
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    out = ring_attention_sharded(q, k, v, _mesh(p), window=w)
    ref = attention_reference(q, k, v, causal_mask(s, window=w), 1.0 / d**0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_alibi_matches_full(rng):
    """Ring attention with ALiBi slopes == the biased full attention —
    global positions must survive the chunk decomposition."""
    from eetq_tpu.ops.alibi import alibi_slopes

    p = 4
    b, s, hq, hkv, d = 1, 64, 4, 2, 16
    slopes = jnp.asarray(alibi_slopes(hq))
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    out = ring_attention_sharded(q, k, v, _mesh(p), slopes=slopes)
    ref = attention_reference(
        q, k, v, causal_mask(s), 1.0 / d**0.5, slopes=slopes
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )
