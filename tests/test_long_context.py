"""Sequence-parallel long-context prefill (ring attention integrated at the
model level) vs the single-device path. SURVEY.md §5 long-context goal; the
reference has no sequence scaling at all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.dist import generate_long, long_prefill, make_mesh
from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.serve.generate import greedy_generate, prefill
from eetq_tpu.models.transformer import init_caches

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=256,
)


@pytest.fixture(scope="module")
def params():
    return quantize_params(
        random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )


def _mesh(p):
    if len(jax.devices()) < p:
        pytest.skip(f"needs >= {p} devices")
    return make_mesh(tp=p, dp=1)


@pytest.mark.parametrize("p", [2, 4])
def test_long_prefill_logits_match_single_device(params, p):
    mesh = _mesh(p)
    rng = np.random.default_rng(0)
    s = 64
    toks = jnp.asarray(rng.integers(1, CFG.vocab_size, size=(2, s)), jnp.int32)

    logits_sp, caches_sp = long_prefill(params, CFG, toks, mesh)
    caches_1 = init_caches(CFG, 2, s)
    logits_1, caches_1 = prefill(params, CFG, toks, caches_1)

    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_1), atol=0.05
    )
    # the gathered KV caches must match the dense prefill caches over the
    # valid prefix
    for csp, c1 in zip(caches_sp, caches_1):
        np.testing.assert_allclose(
            np.asarray(csp.k[:, :, :s], np.float32),
            np.asarray(c1.k[:, :, :s], np.float32),
            atol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(csp.v[:, :, :s], np.float32),
            np.asarray(c1.v[:, :, :s], np.float32),
            atol=0.05,
        )


def test_generate_long_matches_greedy(params):
    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    s, n_new = 32, 6
    prompt = jnp.asarray(rng.integers(1, CFG.vocab_size, size=(1, s)), jnp.int32)
    got = generate_long(params, CFG, prompt, n_new, mesh)
    want = greedy_generate(params, CFG, prompt, n_new)
    # random tiny-model argmax margins can flip on summation-order jitter;
    # require exact here (CPU, same kernels) — loosen only if flaky
    assert [int(t) for t in np.asarray(got[0])] == [
        int(t) for t in np.asarray(want[0])
    ]


def test_long_prefill_rejects_unsupported(params):
    mesh = _mesh(2)
    with pytest.raises(ValueError):
        long_prefill(params, CFG, jnp.zeros((1, 9), jnp.int32), mesh)


def test_generate_long_sliding_window(params):
    """Ring-attention prefill for SLIDING-WINDOW models (r5; long-context
    mistral is exactly the model that wants this): the window crosses
    chunk boundaries and the decode handoff keeps windowed attention."""
    import dataclasses

    cfg = dataclasses.replace(CFG, sliding_window=24)
    mesh = _mesh(4)
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(1, 64)),
                         jnp.int32)
    got = generate_long(params, cfg, prompt, 6, mesh)
    want = greedy_generate(params, cfg, prompt, 6)
    assert [int(t) for t in np.asarray(got[0])] == [
        int(t) for t in np.asarray(want[0])
    ]


def test_generate_long_alibi(params):
    """Ring-attention prefill for ALiBi models (r5; baichuan-13b): global
    positions drive the bias across chunks, no RoPE applied."""
    import dataclasses

    cfg = dataclasses.replace(CFG, alibi=True)
    mesh = _mesh(4)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(1, 32)),
                         jnp.int32)
    got = generate_long(params, cfg, prompt, 6, mesh)
    want = greedy_generate(params, cfg, prompt, 6)
    assert [int(t) for t in np.asarray(got[0])] == [
        int(t) for t in np.asarray(want[0])
    ]
