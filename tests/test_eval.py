"""Perplexity harness tests: correctness of the NLL accounting and the
W8A16 near-losslessness claim (BASELINE.md ΔPPL target) on a tiny model."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.models.transformer import forward
from eetq_tpu.serve.eval import delta_ppl, perplexity

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


@pytest.fixture(scope="module")
def dense_params():
    return random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)


def _manual_ppl(params, ids, window):
    """Straight-line reference: per-window shifted cross-entropy."""
    total, cnt = 0.0, 0
    for i in range(0, len(ids), window):
        chunk = np.asarray(ids[i : i + window], np.int32)
        toks = jnp.asarray(chunk[None, :])
        pos = jnp.arange(len(chunk), dtype=jnp.int32)[None, :]
        logits, _ = forward(params, CFG, toks, pos, None, jnp.int32(0))
        logp = jax.nn.log_softmax(np.asarray(logits[0], np.float32), axis=-1)
        for t in range(len(chunk) - 1):
            total += -logp[t, chunk[t + 1]]
            cnt += 1
    return math.exp(total / cnt)


def test_perplexity_matches_manual(dense_params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=100)
    got = perplexity(dense_params, CFG, ids, window=32)
    want = _manual_ppl(dense_params, ids, 32)
    assert got == pytest.approx(want, rel=1e-3)


def test_perplexity_batched_equals_unbatched(dense_params):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=128)
    p1 = perplexity(dense_params, CFG, ids, window=32, batch_size=1)
    p2 = perplexity(dense_params, CFG, ids, window=32, batch_size=4)
    assert p1 == pytest.approx(p2, rel=1e-3)


def test_quantized_delta_ppl_small(dense_params):
    """W8A16 per-channel PTQ must be near-lossless even on a random tiny
    model (the real acceptance run is Llama on WikiText-2; this guards the
    plumbing and the quantizer numerics)."""
    qparams = quantize_params(dense_params)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, size=256)
    r = delta_ppl(dense_params, qparams, CFG, ids, window=64)
    # random-weight models sit near PPL=vocab_size; int8 weight error moves
    # it by well under 1%.
    assert abs(r["delta_ppl"]) / r["ppl_dense"] < 0.01, r
