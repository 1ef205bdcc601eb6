"""Native host quantizer tests: bit-exactness with the JAX quantizer
(quant/quantizer.py) and with the tile layout packer — the analogue of the
reference's dual-path consistency check, across the Python/C++ boundary."""

import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.layout import pack_weights
from eetq_tpu.native import (
    host_pack_int4,
    host_symmetric_quantize,
    host_transpose_i8,
    native_available,
)
from eetq_tpu.quant import symmetric_quantize


def test_native_builds():
    """g++ is in the image; the native path must actually be exercised."""
    assert native_available()


@pytest.mark.parametrize("dtype", [np.float32, np.float16])
@pytest.mark.parametrize("bits,g", [(8, None), (8, 64), (4, None), (4, 128)])
def test_bit_exact_vs_jax(rng, dtype, bits, g):
    w = (rng.standard_normal((256, 192)) * 0.1).astype(dtype)
    q_n, s_n = host_symmetric_quantize(w, bits=bits, group_size=g)
    q_j, s_j = symmetric_quantize(
        jnp.asarray(w.astype(np.float32)), bits=bits, group_size=g
    )
    np.testing.assert_array_equal(q_n, np.asarray(q_j))
    np.testing.assert_array_equal(s_n, np.asarray(s_j))


def test_bit_exact_bf16(rng):
    import jax

    w32 = (rng.standard_normal((128, 128)) * 0.1).astype(np.float32)
    w_bf = jnp.asarray(w32, jnp.bfloat16)
    q_n, s_n = host_symmetric_quantize(np.asarray(w_bf))
    q_j, s_j = symmetric_quantize(w_bf.astype(jnp.float32))
    np.testing.assert_array_equal(q_n, np.asarray(q_j))
    np.testing.assert_array_equal(s_n, np.asarray(s_j))


def test_3d_experts(rng):
    w = rng.standard_normal((3, 64, 96)).astype(np.float32)
    q_n, s_n = host_symmetric_quantize(w)
    q_j, s_j = symmetric_quantize(jnp.asarray(w))
    np.testing.assert_array_equal(q_n, np.asarray(q_j))
    np.testing.assert_array_equal(s_n, np.asarray(s_j))
    assert s_n.shape == (3, 96)


def test_pack_int4_matches_layout(rng):
    q = rng.integers(-8, 8, size=(512, 256)).astype(np.int8)
    packed_native = host_pack_int4(q)
    packed_jax = np.asarray(pack_weights(jnp.asarray(q), bits=4).data)
    np.testing.assert_array_equal(packed_native, packed_jax)


def test_transpose(rng):
    a = rng.integers(-128, 128, size=(300, 513)).astype(np.int8)
    np.testing.assert_array_equal(host_transpose_i8(a), a.T)


def test_numpy_fallback_matches(rng, monkeypatch):
    import eetq_tpu.native as nat

    w = rng.standard_normal((128, 64)).astype(np.float32)
    q1, s1 = host_symmetric_quantize(w, group_size=32)
    q2, s2 = nat._numpy_quantize(w[None], 8, 32)
    np.testing.assert_array_equal(q1, q2[0])
    np.testing.assert_array_equal(s1, s2[0])


def test_zero_column():
    w = np.zeros((64, 32), np.float32)
    q, s = host_symmetric_quantize(w)
    assert (q == 0).all() and (s == 0).all()
