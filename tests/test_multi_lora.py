"""Multi-adapter LoRA serving (the LoRAX hosting model the reference's
LoRA machinery exists for, reference `README.md:96-101`): one quantized
base + a bank of adapters, selected per request. The engine's
mixed-adapter batch must reproduce each adapter's single-model output."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.serve.engine import Engine
from eetq_tpu.serve.generate import greedy_generate
from eetq_tpu.surgery import attach_lora, stack_adapters

CFG = ModelConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=16,
    max_position=128,
)


def _adapted_models(n=3, rank=4):
    """n separately-adapted copies of one quantized base. Adapter 0 keeps
    B = 0 (exact no-op); the others get random non-zero B."""
    base = quantize_params(
        random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    models = []
    for i in range(n):
        m = attach_lora(base, rank=rank, key=jax.random.PRNGKey(10 + i))
        if i > 0:
            def bump(ad, i=i):
                return dataclasses.replace(
                    ad,
                    lora_b=(
                        0.4
                        * jax.random.normal(
                            jax.random.PRNGKey(100 * i), ad.lora_b.shape,
                            jnp.float32,
                        )
                    ).astype(ad.lora_b.dtype),
                )

            m = dataclasses.replace(
                m,
                layers=[
                    dataclasses.replace(
                        lp, qkv_lora=bump(lp.qkv_lora), o_lora=bump(lp.o_lora)
                    )
                    for lp in m.layers
                ],
            )
        models.append(m)
    return models


@pytest.fixture(scope="module")
def bank_and_singles():
    singles = _adapted_models()
    return stack_adapters(singles), singles


def test_bank_shapes(bank_and_singles):
    bank, singles = bank_and_singles
    lp = bank.layers[0]
    assert lp.qkv_lora.lora_a.shape[0] == 3
    assert lp.o_lora.lora_b.shape[0] == 3
    assert lp.qkv_lora.lora_a.ndim == 3


def test_banked_forward_matches_single(bank_and_singles):
    """forward(lora_idx=[i]) == the i-th single-adapter model's forward."""
    from eetq_tpu.models.transformer import forward

    bank, singles = bank_and_singles
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (1, 8))
    for i, single in enumerate(singles):
        want, _ = forward(single, CFG, toks, pos, None, 0)
        got, _ = forward(
            bank, CFG, toks, pos, None, 0,
            lora_idx=jnp.asarray([i], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )


def test_engine_mixed_adapters_match_singles(bank_and_singles):
    """A mixed-adapter engine batch reproduces per-adapter generate()."""
    bank, singles = bank_and_singles
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, CFG.vocab_size, size=n))
               for n in (9, 13, 7)]
    new = 6

    eng = Engine(bank, CFG, max_batch=4, max_len=64, prompt_buckets=(16,),
                 decode_window=4)
    uids = [
        eng.add_request(p, new, lora_id=i) for i, p in enumerate(prompts)
    ]
    eng.run()

    for i, (p, u) in enumerate(zip(prompts, uids)):
        want = np.asarray(
            greedy_generate(
                singles[i], CFG,
                jnp.asarray([p], jnp.int32), new,
            )
        )[0]
        assert eng.result(u) == list(want), (i, eng.result(u), list(want))


def test_spec_engine_banked_adapters(bank_and_singles):
    """spec × banked LoRA (r5): the n-gram speculative window's verify
    forward applies each row's own adapter (lora_ids ride into the
    while_loop), so a mixed-adapter spec engine reproduces per-adapter
    greedy generate()."""
    bank, singles = bank_and_singles
    prompts = [[3, 17, 42, 9, 3, 17], [11] * 8, [5, 6, 7, 8, 5, 6]]
    new = 8
    eng = Engine(bank, CFG, max_batch=4, max_len=64, prompt_buckets=(8,),
                 decode_window=4, spec_ngram=3)
    uids = [eng.add_request(p, new, lora_id=i)
            for i, p in enumerate(prompts)]
    eng.run()
    for i, (p, u) in enumerate(zip(prompts, uids)):
        want = np.asarray(
            greedy_generate(singles[i], CFG, jnp.asarray([p], jnp.int32), new)
        )[0]
        assert eng.result(u) == list(want), (i, eng.result(u), list(want))


def test_engine_slot_recycling_keeps_adapters(bank_and_singles):
    """More requests than slots: recycled slots must pick up the NEW
    request's adapter."""
    bank, singles = bank_and_singles
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, CFG.vocab_size, size=8))
               for _ in range(4)]
    ids = [1, 2, 1, 2]
    new = 5
    eng = Engine(bank, CFG, max_batch=2, max_len=64, prompt_buckets=(16,),
                 decode_window=4)
    uids = [eng.add_request(p, new, lora_id=i)
            for p, i in zip(prompts, ids)]
    eng.run()
    for p, i, u in zip(prompts, ids, uids):
        want = np.asarray(
            greedy_generate(singles[i], CFG, jnp.asarray([p], jnp.int32), new)
        )[0]
        assert eng.result(u) == list(want)


def test_lora_id_validation(bank_and_singles):
    bank, _ = bank_and_singles
    eng = Engine(bank, CFG, max_batch=2, max_len=64, prompt_buckets=(16,))
    with pytest.raises(ValueError, match="out of range"):
        eng.add_request([1, 2], 4, lora_id=7)
    base = quantize_params(
        random_dense_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    )
    eng2 = Engine(base, CFG, max_batch=2, max_len=64, prompt_buckets=(16,))
    with pytest.raises(ValueError, match="adapter banks"):
        eng2.add_request([1, 2], 4, lora_id=1)


def test_banked_requires_idx(bank_and_singles):
    bank, _ = bank_and_singles
    from eetq_tpu.modules.linear import linear_apply

    lp = bank.layers[0]
    x = jnp.ones((1, 2, CFG.hidden_size), jnp.bfloat16)
    with pytest.raises(ValueError, match="lora_idx"):
        linear_apply(lp.qkv, x, lora=lp.qkv_lora)
