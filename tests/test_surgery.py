"""Surgery property tests: scale-exact fuse/split (SURVEY.md hard part #2)
and the pytree quantize-and-swap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.layout import unpack_weights
from eetq_tpu.modules.linear import DenseLinear, QuantLinear, quantize_linear
from eetq_tpu.quant import symmetric_quantize
from eetq_tpu.surgery import (
    eet_quantize,
    fuse_gateup,
    fuse_qkv,
    split_quant_columns,
)


def test_fuse_then_quantize_equals_quantize_then_fuse(rng):
    """Per-column scales make fusion commute with quantization."""
    k = 64
    wq = rng.standard_normal((k, 32)).astype(np.float32)
    wk = rng.standard_normal((k, 16)).astype(np.float32)
    wv = rng.standard_normal((k, 16)).astype(np.float32)
    fused = fuse_qkv(jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv))
    qf, sf = symmetric_quantize(fused)
    for w, sl in [(wq, slice(0, 32)), (wk, slice(32, 48)), (wv, slice(48, 64))]:
        qi, si = symmetric_quantize(jnp.asarray(w))
        np.testing.assert_array_equal(np.asarray(qf[:, sl]), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(sf[sl]), np.asarray(si), rtol=1e-7)


def test_split_quant_columns_bit_exact(rng):
    """quantize(fused) then split == the q/k/v slices, bit for bit."""
    k = 64
    wq = rng.standard_normal((k, 32)).astype(np.float32)
    wk = rng.standard_normal((k, 16)).astype(np.float32)
    wv = rng.standard_normal((k, 16)).astype(np.float32)
    ql = quantize_linear(fuse_qkv(jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv)))
    parts = split_quant_columns(ql, [32, 16, 16])
    for part, w in zip(parts, [wq, wk, wv]):
        direct = quantize_linear(jnp.asarray(w))
        np.testing.assert_array_equal(
            np.asarray(unpack_weights(part.qweight)),
            np.asarray(unpack_weights(direct.qweight)),
        )
        np.testing.assert_allclose(
            np.asarray(part.scales), np.asarray(direct.scales), rtol=1e-7
        )


def test_split_sizes_validated(rng):
    ql = quantize_linear(jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32)))
    with pytest.raises(ValueError):
        split_quant_columns(ql, [32, 16])  # doesn't sum to 64


def test_gateup_fuse_split_roundtrip(rng):
    g = rng.standard_normal((32, 48)).astype(np.float32)
    u = rng.standard_normal((32, 48)).astype(np.float32)
    ql = quantize_linear(fuse_gateup(jnp.asarray(g), jnp.asarray(u)))
    gs, us = split_quant_columns(ql, [48, 48])
    np.testing.assert_array_equal(
        np.asarray(unpack_weights(gs.qweight)),
        np.asarray(unpack_weights(quantize_linear(jnp.asarray(g)).qweight)),
    )


def test_eet_quantize_excludes_lm_head(rng):
    from eetq_tpu.models import ModelConfig, random_dense_params

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16, max_position=16,
    )
    dense = random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = eet_quantize(dense)
    assert isinstance(q.layers[0].qkv, QuantLinear)
    assert isinstance(q.layers[0].down, QuantLinear)
    assert isinstance(q.lm_head, DenseLinear)  # excluded
    # custom exclusion
    q2 = eet_quantize(dense, exclude=("lm_head", r"layers\[0\].down"))
    assert isinstance(q2.layers[0].down, DenseLinear)
    # int4
    q3 = eet_quantize(dense, bits=4)
    assert int(np.abs(np.asarray(unpack_weights(q3.layers[0].qkv.qweight))).max()) <= 8
