"""Quantizer semantics tests, mirroring the reference contract
(`cutlass_preprocessors.cc:581-678`): scale = absmax/128 per output channel,
round-half-away, clip to [-128, 127]."""

import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.quant import (
    dequantize,
    int4_pack,
    int4_unpack,
    symmetric_quantize,
)


def _np_reference_quantize(w, bits=8):
    """Independent numpy oracle with C round() semantics."""
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    absmax = np.abs(w).max(axis=-2)
    scale = absmax / (2 ** (bits - 1))
    safe = np.where(scale == 0, 1.0, scale)
    scaled = w / safe[..., None, :]
    q = np.trunc(scaled + np.where(scaled >= 0, 0.5, -0.5))
    return np.clip(q, qmin, qmax).astype(np.int8), scale


@pytest.mark.parametrize("shape", [(64, 32), (128, 256), (3, 64, 48)])
@pytest.mark.parametrize("bits", [8, 4])
def test_matches_numpy_oracle(rng, shape, bits):
    w = rng.standard_normal(shape).astype(np.float32)
    q, s = symmetric_quantize(jnp.asarray(w), bits=bits)
    q_ref, s_ref = _np_reference_quantize(w, bits=bits)
    np.testing.assert_array_equal(np.asarray(q), q_ref)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-6)


def test_roundtrip_error_bounded(rng):
    w = rng.standard_normal((512, 256)).astype(np.float32)
    q, s = symmetric_quantize(jnp.asarray(w))
    w_hat = dequantize(q, s)
    # With scale = absmax/128, elements with |w| in (127.5*scale, absmax]
    # clip to 127 and can err by up to one full step; everything else errs by
    # at most half a step. (Small slack for f32 rounding of w/scale.)
    err = np.abs(np.asarray(w_hat) - w)
    s_np = np.asarray(s)[None, :]
    full = np.broadcast_to(s_np * 1.001 + 1e-7, w.shape)
    np.testing.assert_array_less(err, full)
    unclipped = np.abs(w) <= 127.4 * s_np
    half = np.broadcast_to(s_np * 0.5005 + 1e-7, w.shape)
    np.testing.assert_array_less(err[unclipped], half[unclipped])


def test_scale_is_absmax_over_128(rng):
    w = rng.standard_normal((100, 37)).astype(np.float32)
    _, s = symmetric_quantize(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(s), np.abs(w).max(0) / 128.0, rtol=1e-6)


def test_max_magnitude_column_hits_qmin_or_clips():
    # The element equal to absmax maps to round(absmax / (absmax/128)) = 128,
    # clipped to 127; its negation maps to -128 exactly.
    w = jnp.array([[1.0], [-1.0], [0.5]], dtype=jnp.float32)
    q, s = symmetric_quantize(w)
    assert int(q[0, 0]) == 127
    assert int(q[1, 0]) == -128


def test_zero_column_safe():
    w = jnp.zeros((16, 4), dtype=jnp.float32)
    q, s = symmetric_quantize(w)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 0)


def test_3d_experts_independent(rng):
    """3-D batched weights quantize each expert independently
    (reference `cutlass_preprocessors.cc:594-614`)."""
    w = rng.standard_normal((4, 32, 16)).astype(np.float32)
    q, s = symmetric_quantize(jnp.asarray(w))
    assert q.shape == (4, 32, 16) and s.shape == (4, 16)
    for e in range(4):
        qe, se = symmetric_quantize(jnp.asarray(w[e]))
        np.testing.assert_array_equal(np.asarray(q[e]), np.asarray(qe))
        np.testing.assert_allclose(np.asarray(s[e]), np.asarray(se), rtol=1e-6)


def test_int4_pack_roundtrip(rng):
    w = rng.standard_normal((32, 64)).astype(np.float32)
    q, _ = symmetric_quantize(jnp.asarray(w), bits=4)
    packed = int4_pack(q)
    assert packed.shape == (32, 32)
    np.testing.assert_array_equal(np.asarray(int4_unpack(packed)), np.asarray(q))


def test_bf16_input(rng):
    w = rng.standard_normal((64, 64)).astype(np.float32)
    q32, s32 = symmetric_quantize(jnp.asarray(w))
    qb, sb = symmetric_quantize(jnp.asarray(w, dtype=jnp.bfloat16))
    # Same shapes/dtypes; values close (bf16 rounding of the input).
    assert qb.dtype == jnp.int8 and sb.dtype == jnp.float32
    assert np.abs(np.asarray(q32, np.int32) - np.asarray(qb, np.int32)).max() <= 2
