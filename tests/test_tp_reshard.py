"""Offline TP reshard tests — the reference `quantize(save_dir, tp)` flow
(`models/base.py:74-102`, `utils/base.py:132-250`) rebuilt with bit-exactness
property tests (SURVEY.md hard part #2/#3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.dist.sharding import split_qkv_columns, split_rows
from eetq_tpu.layout import unpack_weights
from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.models.transformer import forward
from eetq_tpu.modules.linear import QuantLinear, quantize_linear
from eetq_tpu.quant import symmetric_quantize
from eetq_tpu.surgery.tp_reshard import (
    quantize_params_tp,
    split_quant_rows,
)

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=64,
)


# ---- the two core invariants ----


def test_column_split_commutes_with_quantization(rng):
    """Per-output-channel scales: split-then-quantize == quantize-then-split
    for column-parallel (fused qkv, GQA) weights — bit-exact."""
    tp = 2
    w = jnp.asarray(
        rng.standard_normal(
            (CFG.hidden_size, (CFG.num_heads + 2 * CFG.num_kv_heads) * CFG.head_dim)
        ).astype(np.float32)
    )
    # quantize whole, then split
    q_all, s_all = symmetric_quantize(w)
    q_splits = split_qkv_columns(q_all, CFG, tp)
    s_splits = split_qkv_columns(s_all, CFG, tp)
    # split dense, then quantize each shard
    for i, wi in enumerate(split_qkv_columns(w, CFG, tp)):
        qi, si = symmetric_quantize(wi)
        np.testing.assert_array_equal(np.asarray(qi), np.asarray(q_splits[i]))
        np.testing.assert_array_equal(np.asarray(si), np.asarray(s_splits[i]))


def test_row_split_equals_groupwise_quantization(rng):
    """Independent per-rank K-slice quantization == group-wise quantization
    with group_size = K/tp — bit-exact."""
    tp = 4
    k, n = 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    q_gw, s_gw = symmetric_quantize(w, group_size=k // tp)
    for i, wi in enumerate(split_rows(w, tp)):
        qi, si = symmetric_quantize(wi)
        np.testing.assert_array_equal(
            np.asarray(qi), np.asarray(q_gw)[i * k // tp : (i + 1) * k // tp]
        )
        np.testing.assert_array_equal(np.asarray(si), np.asarray(s_gw)[i])


def test_split_quant_rows_bit_exact(rng):
    """split_quant_rows of a TP-quantized linear == independently quantized
    shards (qweight AND scales)."""
    tp = 2
    k, n = 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    merged = quantize_linear(w, group_size=k // tp)
    shards = split_quant_rows(merged, tp)
    for i, wi in enumerate(split_rows(w, tp)):
        ref = quantize_linear(wi)
        np.testing.assert_array_equal(
            np.asarray(unpack_weights(shards[i].qweight)),
            np.asarray(unpack_weights(ref.qweight)),
        )
        np.testing.assert_allclose(
            np.asarray(shards[i].scales), np.asarray(ref.scales), rtol=1e-7
        )


# ---- model-level flow ----


@pytest.fixture(scope="module")
def dense():
    return random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)


def test_quantize_params_tp_shapes(dense):
    qp = quantize_params_tp(dense, CFG, tp=2)
    lp = qp.layers[0]
    assert isinstance(lp.qkv, QuantLinear) and lp.qkv.scales.ndim == 1
    assert lp.o_proj.scales.shape == (2, CFG.hidden_size)
    assert lp.down.scales.shape == (2, CFG.hidden_size)
    assert lp.gateup.scales.ndim == 1


def test_tp_quantized_model_serves_single_chip(dense):
    """The merged TP artifact must run directly (the reference's merged
    module cannot) and stay close to the plain-quantized model."""
    qp_tp = quantize_params_tp(dense, CFG, tp=2)
    qp = quantize_params(dense)
    toks = jnp.arange(8, dtype=jnp.int32)[None, :] % CFG.vocab_size
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    lg_tp, _ = forward(qp_tp, CFG, toks, pos, None, jnp.int32(0))
    lg, _ = forward(qp, CFG, toks, pos, None, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(lg_tp), np.asarray(lg), atol=0.1, rtol=0.1
    )


def test_tp_checkpoint_roundtrip(tmp_path, dense):
    """quantize(tp=2) -> save -> load preserves qweights and group scales
    bit-exactly, and the loaded model forward matches."""
    from eetq_tpu.models.hf import load_quantized, save_quantized

    qp = quantize_params_tp(dense, CFG, tp=2)
    cfg = dataclasses.replace(CFG)
    save_quantized(qp, cfg, str(tmp_path), tp=2)
    cfg2, loaded = load_quantized(str(tmp_path))
    for lp, lp2 in zip(qp.layers, loaded.layers):
        for f in ("qkv", "o_proj", "gateup", "down"):
            a, b = getattr(lp, f), getattr(lp2, f)
            np.testing.assert_array_equal(
                np.asarray(unpack_weights(a.qweight)),
                np.asarray(unpack_weights(b.qweight)),
            )
            assert a.scales.shape == b.scales.shape
            np.testing.assert_allclose(
                np.asarray(a.scales), np.asarray(b.scales), rtol=1e-3
            )
    toks = jnp.arange(8, dtype=jnp.int32)[None, :] % CFG.vocab_size
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    lg1, _ = forward(qp, CFG, toks, pos, None, jnp.int32(0))
    lg2, _ = forward(loaded, cfg2, toks, pos, None, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), atol=2e-2)


def test_shard_quantized_matches_merged(dense):
    """Sharded execution of a TP-quantized model == single-chip execution of
    the merged model (same integer weights, same per-shard scales)."""
    from eetq_tpu.dist import make_mesh
    from eetq_tpu.dist.sharding import make_forward_fn
    from eetq_tpu.models import init_caches
    from eetq_tpu.surgery.tp_reshard import shard_quantized

    tp = 2
    if len(jax.devices()) < tp:
        pytest.skip("needs >= 2 devices")
    qp = quantize_params_tp(dense, CFG, tp=tp)
    mesh = make_mesh(tp=tp, dp=1)
    model = shard_quantized(qp, CFG, mesh)
    fwd = make_forward_fn(model)

    b, s, max_len = 1, 8, 16
    toks = jnp.arange(s, dtype=jnp.int32)[None, :] % CFG.vocab_size
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    caches = init_caches(CFG, b, max_len)
    lg_sh, _ = fwd(model.params, toks, pos, caches, jnp.int32(0))

    lg_merged, _ = forward(qp, CFG, toks, pos, init_caches(CFG, b, max_len),
                           jnp.int32(0))
    # same integer weights/scales; differences are bf16 accumulation order
    # (psum of partials vs sequential group loop)
    np.testing.assert_allclose(
        np.asarray(lg_sh), np.asarray(lg_merged), atol=8e-2, rtol=8e-2
    )
