"""Pack/unpack roundtrip and layout invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.layout import (
    DEFAULT_LAYOUT,
    PackedWeight,
    pack_weights,
    unpack_weights,
)
from eetq_tpu.quant import symmetric_quantize


@pytest.mark.parametrize("shape", [(256, 256), (100, 37), (5120, 13824), (2, 100, 300)])
def test_pack_unpack_roundtrip(rng, shape):
    q = rng.integers(-128, 128, size=shape).astype(np.int8)
    packed = pack_weights(jnp.asarray(q))
    assert packed.kp % DEFAULT_LAYOUT.k_tile == 0
    assert packed.np % DEFAULT_LAYOUT.n_tile == 0
    np.testing.assert_array_equal(np.asarray(unpack_weights(packed)), q)


def test_padding_is_zero(rng):
    q = rng.integers(-128, 128, size=(100, 37)).astype(np.int8)
    packed = pack_weights(jnp.asarray(q))
    data = np.asarray(packed.data)
    assert np.all(data[100:, :] == 0)
    assert np.all(data[:, 37:] == 0)


def test_pack_rejects_non_int8(rng):
    with pytest.raises(TypeError):
        pack_weights(jnp.ones((32, 32), dtype=jnp.float32))


def test_packedweight_is_pytree(rng):
    import jax

    q, _ = symmetric_quantize(jnp.asarray(rng.standard_normal((64, 64), ).astype(np.float32)))
    packed = pack_weights(q)
    leaves, treedef = jax.tree.flatten(packed)
    assert len(leaves) == 1  # static metadata not traced
    rebuilt = jax.tree.unflatten(treedef, leaves)
    assert isinstance(rebuilt, PackedWeight) and rebuilt.k == 64
