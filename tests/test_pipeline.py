"""Pipeline-parallel correctness on the 8-device virtual CPU mesh: the
stage-pipelined forward/generate must match the single-device path.

The reference has no PP at all (SURVEY.md §2.3 — accelerate `device_map` is
sequential placement, not pipelining); these tests pin the from-scratch ring
schedule (dist/pipeline.py) against the plain forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.dist import (
    init_pp_caches,
    make_pp_mesh,
    pp_decode_loop,
    pp_generate,
    pp_prefill,
    shard_model_pp,
)
from eetq_tpu.models import (
    ModelConfig,
    init_caches,
    quantize_params,
    random_dense_params,
)
from eetq_tpu.serve.generate import generate

CFG = ModelConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=8,
    num_kv_heads=4,
    head_dim=16,
    max_position=64,
)


@pytest.fixture(scope="module")
def dense_params():
    return random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def _tokens(b, s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (b, s)), jnp.int32)


def _ref_tokens(params_q, prompt, new_tokens, temperature=0.0, top_k=0):
    return np.asarray(
        generate(params_q, CFG, prompt, new_tokens, temperature=temperature,
                 top_k=top_k)
    )


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (2, 4)])
def test_pp_generate_matches_single_device(dense_params, pp, microbatches):
    """Greedy pipelined generation == single-device generation. With tp=1
    every stage holds whole (unsplit) layers quantized exactly like
    quantize_params, so tokens must match exactly — including with more
    microbatches in flight than stages."""
    prompt = _tokens(4, 8)
    new_tokens = 6

    mesh = make_pp_mesh(pp=pp, tp=1, dp=1)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    got = np.asarray(
        pp_generate(model, prompt, new_tokens, microbatches=microbatches)
    )

    params_q = quantize_params(dense_params)
    want = _ref_tokens(params_q, prompt, new_tokens)
    np.testing.assert_array_equal(got, want)


def test_pp_tp_matches_tp_reference(dense_params):
    """PP x TP == plain TP with the same tp: the stage split adds no
    numerics (per-shard quantization is identical; only the schedule
    changes), so greedy tokens must agree with a tp=2 shard_map reference
    driven step-by-step."""
    from eetq_tpu.dist import make_mesh, shard_model
    from eetq_tpu.dist.sharding import make_forward_fn

    prompt = _tokens(4, 8, seed=11)
    new_tokens = 6
    b, s = prompt.shape

    mesh = make_pp_mesh(pp=2, tp=2, dp=1)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    got = np.asarray(pp_generate(model, prompt, new_tokens, microbatches=2))

    tmesh = make_mesh(tp=2, dp=1)
    tmodel = shard_model(dense_params, CFG, tmesh, quantize=True)
    fwd = make_forward_fn(tmodel)
    caches = init_caches(CFG, b, s + new_tokens)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    logits, caches = fwd(tmodel.params, prompt, pos, caches, jnp.int32(0))
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    want = [token]
    for i in range(new_tokens - 1):
        p = jnp.full((b, 1), s + i, jnp.int32)
        logits, caches = fwd(
            tmodel.params, token[:, None], p, caches, jnp.int32(s + i)
        )
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        want.append(token)
    np.testing.assert_array_equal(got, np.stack([np.asarray(t) for t in want], 1))


def test_pp_prefill_logits_match(dense_params):
    """Pipelined prefill logits (last token) == plain forward logits."""
    from eetq_tpu.models.transformer import forward

    prompt = _tokens(4, 8, seed=3)
    mesh = make_pp_mesh(pp=2, tp=1, dp=1)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    caches = init_pp_caches(model, 4, 32)
    logits, _ = pp_prefill(model, prompt, caches, microbatches=2)

    params_q = quantize_params(dense_params)
    ref_caches = init_caches(CFG, 4, 32)
    b, s = prompt.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    ref_logits, _ = forward(params_q, CFG, prompt, positions, ref_caches, 0)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits[:, -1, :]),
        rtol=2e-2, atol=2e-2,
    )


def test_pp_decode_caches_advance(dense_params):
    """The ring decode writes KV for every generated position: decoding a
    second window from the returned caches continues exactly as one long
    window would."""
    prompt = _tokens(4, 8, seed=5)
    mesh = make_pp_mesh(pp=2, tp=1, dp=1)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    caches = init_pp_caches(model, 4, 32)
    logits, caches = pp_prefill(model, prompt, caches, microbatches=2)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    toks_long, _ = pp_decode_loop(model, first, 8, caches, 9, microbatches=2)

    caches2 = init_pp_caches(model, 4, 32)
    _, caches2 = pp_prefill(model, prompt, caches2, microbatches=2)
    toks_a, caches2 = pp_decode_loop(model, first, 8, caches2, 5,
                                     microbatches=2)
    toks_b, _ = pp_decode_loop(model, toks_a[:, -1], 12, caches2, 5,
                               microbatches=2)
    got = np.concatenate([np.asarray(toks_a), np.asarray(toks_b)[:, 1:]], 1)
    np.testing.assert_array_equal(got, np.asarray(toks_long))


def test_pp_sampled_decode_valid_tokens(dense_params):
    """Sampled pipelined decode produces in-vocab tokens and is
    deterministic for a fixed key."""
    prompt = _tokens(4, 8, seed=7)
    mesh = make_pp_mesh(pp=2, tp=1, dp=1)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    key = jax.random.PRNGKey(42)
    a = np.asarray(
        pp_generate(model, prompt, 5, microbatches=2, temperature=0.8,
                    top_k=40, key=key)
    )
    b = np.asarray(
        pp_generate(model, prompt, 5, microbatches=2, temperature=0.8,
                    top_k=40, key=key)
    )
    assert a.shape == (4, 5)
    assert (a >= 0).all() and (a < CFG.vocab_size).all()
    np.testing.assert_array_equal(a, b)


def test_pp_validation():
    mesh = make_pp_mesh(pp=2, tp=1, dp=1)
    dense = random_dense_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    model = shard_model_pp(dense, CFG, mesh, quantize=True)
    caches = init_pp_caches(model, 4, 32)
    first = jnp.zeros((4,), jnp.int32)
    with pytest.raises(ValueError, match="microbatches"):
        pp_decode_loop(model, first, 8, caches, 4, microbatches=1)
    with pytest.raises(ValueError, match="divisible"):
        pp_decode_loop(model, jnp.zeros((3,), jnp.int32), 8, caches, 4,
                       microbatches=2)
    import dataclasses

    bad_cfg = dataclasses.replace(CFG, num_layers=3)
    with pytest.raises(ValueError, match="not divisible by pp"):
        shard_model_pp(
            random_dense_params(bad_cfg, jax.random.PRNGKey(2),
                                dtype=jnp.float32),
            bad_cfg, mesh, quantize=True,
        )


def test_pp_with_dp_matches_single_device(dense_params):
    """PP composes with DP: (dp=2, pp=2, tp=2) on 8 devices — the batch is
    sharded over `data`, stages pipeline within each replica. Greedy
    tokens must match the plain TP reference (per-shard quantization
    identical; dp only splits the batch)."""
    from eetq_tpu.dist import make_mesh, shard_model
    from eetq_tpu.dist.sharding import make_forward_fn

    prompt = _tokens(4, 8, seed=13)
    new_tokens = 5
    b, s = prompt.shape

    mesh = make_pp_mesh(pp=2, tp=2, dp=2)
    model = shard_model_pp(dense_params, CFG, mesh, quantize=True)
    got = np.asarray(pp_generate(model, prompt, new_tokens, microbatches=2))

    tmesh = make_mesh(tp=2, dp=1)
    tmodel = shard_model(dense_params, CFG, tmesh, quantize=True)
    fwd = make_forward_fn(tmodel)
    caches = init_caches(CFG, b, s + new_tokens)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    logits, caches = fwd(tmodel.params, prompt, pos, caches, jnp.int32(0))
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    want = [token]
    for i in range(new_tokens - 1):
        p = jnp.full((b, 1), s + i, jnp.int32)
        logits, caches = fwd(
            tmodel.params, token[:, None], p, caches, jnp.int32(s + i)
        )
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        want.append(token)
    np.testing.assert_array_equal(
        got, np.stack([np.asarray(t) for t in want], 1)
    )
