"""70B-shape multichip validation (BASELINE config 5 / VERDICT r2 item 5):
shard the REAL Llama-2-70B dimensions (GQA 64q/8kv heads, hidden 8192,
intermediate 28672, vocab 32000) — truncated to 2 layers so it fits a CPU
test — over the 8-device virtual mesh, and prove:

- every sharded axis divides exactly at tp=8 (8 q heads + 1 kv head,
  3584-row row-parallel down shards, 4000-column lm_head shards);
- the sharded forward matches the single-device forward at these dims
  (dense bf16 — the quantized kernel's numerics are dim-independent and
  covered by test_sharding/test_w8a16_matmul; interpret-mode Pallas at
  70B dims would take tens of minutes on the 1-core CI host);
- per-shard quantization at 70B dims produces the right structures:
  stacked [tp, ...] qweights, per-shard scale rows on row-parallel
  layers, a column-split QUANTIZED lm_head;
- per-device weight memory comes out under a v5e chip's 16 GB at the FULL
  80 layers (the serving plan the 70B preset exists for).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.dist import make_mesh, shard_model
from eetq_tpu.dist.sharding import make_forward_fn
from eetq_tpu.models import (
    forward,
    init_caches,
    quantize_params,
    random_dense_params,
)
from eetq_tpu.models.config import LLAMA2_70B
from eetq_tpu.surgery import shard_quantized

TP = 8
CFG_70B_TRUNC = dataclasses.replace(LLAMA2_70B, num_layers=2)


@pytest.fixture(scope="module")
def dense_70b():
    """Fast random params at 70B dims: ~2.2B weights via numpy integer
    draws (jax.random.normal at this scale takes minutes on the 1-core CI
    host; the parity/structure checks only need distinct per-head values,
    not gaussian ones)."""
    from eetq_tpu.models.transformer import LayerParams, ModelParams
    from eetq_tpu.modules.linear import DenseLinear

    cfg = CFG_70B_TRUNC
    rng = np.random.default_rng(0)

    def arr(k, n):
        # 2.2B weights on a 1-core host: raw PRNG bytes -> f32 -> bf16 by
        # TRUNCATION (f32 view >> 16). Every slower route measured
        # pathological at this scale: jax.random.normal (minutes),
        # device-side int8->bf16 casts (~40 MB/s), ml_dtypes astype
        # (~7 M elem/s). jnp.asarray of a numpy bf16 buffer is a memcpy.
        import ml_dtypes

        raw = np.frombuffer(rng.bytes(k * n), dtype=np.int8).reshape(k, n)
        f = raw.astype(np.float32) * 0.004
        bf = (f.view(np.uint32) >> 16).astype(np.uint16).view(
            ml_dtypes.bfloat16
        )
        return jnp.asarray(bf)

    def dl(k, n):
        return DenseLinear(weight=arr(k, n))

    h = cfg.hidden_size
    layers = [
        LayerParams(
            input_norm=jnp.ones((h,), jnp.float32),
            qkv=dl(h, cfg.qkv_out),
            o_proj=dl(cfg.num_heads * cfg.head_dim, h),
            post_norm=jnp.ones((h,), jnp.float32),
            gateup=dl(h, 2 * cfg.intermediate_size),
            down=dl(cfg.intermediate_size, h),
        )
        for _ in range(cfg.num_layers)
    ]
    return ModelParams(
        embed=arr(cfg.vocab_size, h),
        layers=layers,
        final_norm=jnp.ones((h,), jnp.float32),
        lm_head=dl(h, cfg.vocab_size),
    )


def test_70b_dims_divide_at_tp8():
    cfg = LLAMA2_70B
    assert cfg.num_heads % TP == 0 and cfg.num_heads // TP == 8
    assert cfg.num_kv_heads % TP == 0 and cfg.num_kv_heads // TP == 1
    assert cfg.intermediate_size % TP == 0  # 3584-row down shards
    assert cfg.vocab_size % TP == 0  # column-parallel lm_head
    assert cfg.qkv_out == (64 + 2 * 8) * 128  # fused qkv columns


def test_70b_per_device_memory_fits_v5e():
    """int8 weight bytes per device at tp=8, FULL 80 layers, must leave
    room for caches on a 16 GB v5e chip."""
    cfg = LLAMA2_70B
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    per_layer = (
        h * cfg.qkv_out  # qkv (column-parallel)
        + cfg.num_heads * cfg.head_dim * h  # o_proj (row-parallel)
        + h * 2 * inter  # gateup
        + inter * h  # down
    )
    weight_bytes = cfg.num_layers * per_layer  # int8: 1 byte/weight
    embed_bytes = v * h * 2  # bf16 embed (replicated)
    head_bytes = h * v  # int8 quantized lm_head (column-parallel)
    per_device = weight_bytes / TP + embed_bytes + head_bytes / TP
    # ~8.6 GB of weights per chip -> batch*len KV budget remains
    assert per_device < 11e9, per_device
    # KV cache per device at batch=8, len=4096, int8 KV, kv heads sharded:
    kv = 80 * 2 * 8 * 4096 * (cfg.num_kv_heads // TP) * cfg.head_dim
    assert per_device + kv < 15e9, (per_device, kv)


@pytest.mark.slow
def test_70b_truncated_sharded_forward_parity(rng, dense_70b):
    """Real 70B layer shapes across the 8-device mesh: tp=8 forward ==
    single-device forward (GQA 8:1 head split, 3584-row row-parallel,
    4000-column vocab split all exercised at true dimensions)."""
    cfg = CFG_70B_TRUNC
    mesh = make_mesh(tp=TP, dp=1)
    model = shard_model(dense_70b, cfg, mesh, quantize=False)
    fwd = make_forward_fn(model, use_flash=False)
    b, s = 1, 4
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    caches = init_caches(cfg, b, 8)
    logits_sh, _ = fwd(model.params, tokens, pos, caches, jnp.int32(0))

    logits_1d, _ = forward(
        dense_70b, cfg, tokens, pos, None, 0, use_flash=False
    )
    ls, l1 = np.asarray(logits_sh), np.asarray(logits_1d)
    assert np.isfinite(ls).all()
    # bf16 at h=8192: the tp=8 K-partition (f32 partials + psum) sums in a
    # different order than the single-device contraction, so elementwise
    # allclose is the wrong bar (measured: 7% of logits outside
    # rtol=5e-2/atol=8e-2, max |diff| ~1 on logits spanning +-60; relative
    # Frobenius error 0.91% — consistent with ~0.4%/layer bf16 rounding
    # compounding). Scale-aware checks instead: small relative Frobenius
    # error + argmax agreement. A real sharding bug (wrong head mapping,
    # misaligned K split) measures O(1) relative error, 50x above this bar.
    rel = np.linalg.norm(ls - l1) / np.linalg.norm(l1)
    assert rel < 2e-2, rel
    assert (ls.argmax(-1) == l1.argmax(-1)).mean() > 0.95


@pytest.mark.slow
def test_70b_quantized_shard_structure(dense_70b):
    """Per-shard quantization at 70B dims: shard_quantized slices an
    already-quantized model (incl. a QUANTIZED lm_head) losslessly —
    stacked per-device qweights, per-shard scales, column-split head."""
    cfg = CFG_70B_TRUNC
    qp = quantize_params(dense_70b, quantize_lm_head=True)
    mesh = make_mesh(tp=TP, dp=1)
    model = shard_quantized(qp, cfg, mesh)

    lp = model.params.layers[0]
    # (packed buffers are tile-padded, so check LOGICAL dims via qweight
    # metadata, not data.shape)
    # column-parallel qkv: 80 heads' columns -> 10 heads * 128 per shard
    assert lp.qkv.qweight.data.shape[0] == TP
    assert lp.qkv.qweight.n == cfg.qkv_out // TP
    # row-parallel down: K split 28672 -> 3584 rows per shard
    assert lp.down.qweight.k == cfg.intermediate_size // TP
    # quantized lm_head column-split over the vocab
    head = model.params.lm_head
    assert head.qweight.data.shape[0] == TP
    assert head.qweight.n == cfg.vocab_size // TP
    assert head.scales.shape[-1] == cfg.vocab_size // TP
    # lossless: reassembling shard columns recovers the original int8
    from eetq_tpu.layout import unpack_weights

    merged = np.concatenate(
        [np.asarray(unpack_weights(
            dataclasses.replace(head.qweight, data=head.qweight.data[i])
        )) for i in range(TP)],
        axis=-1,
    )
    np.testing.assert_array_equal(
        merged, np.asarray(unpack_weights(qp.lm_head.qweight))
    )
