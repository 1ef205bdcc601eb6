"""Heavy speculative-decoding parity checks, run in a CLEAN subprocess by
test_spec.py.

Why a subprocess: `spec_decode_loop` inlines TWO full models (target +
draft) into one while_loop program. Compiling that program on XLA CPU
*after ~290 prior tests in the same process* segfaulted the interpreter at
`backend_compile` in both r4 full-suite runs (the same test passes in
isolation, rc=0 — in-process compiler-state dependence, not a numerics
bug). Running the two-model compiles in their own process makes the full
`pytest tests/ -q` deterministic: a worst-case compiler crash here fails
ONE test instead of killing the suite at 83%.

Run directly: python tests/spec_checks.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.serve.generate import greedy_generate
from eetq_tpu.serve.spec import positional_generate, spec_generate

TINY = ModelConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=128,
)


def _tokens(rng, b, s, vocab=256):
    return jnp.asarray(rng.integers(0, vocab, size=(b, s)), dtype=jnp.int32)


def check_same_model_accepts_everything(quant_params, rng, k):
    """Draft == target: every draft accepted, output == greedy, and the
    round count shows the full k+1 tokens per round."""
    prompt = _tokens(rng, 1, 8)
    n = 12
    ref = greedy_generate(quant_params, TINY, prompt, n)
    toks, stats = spec_generate(
        quant_params, TINY, quant_params, TINY, prompt, n, k=k,
        return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    assert stats["rounds"] == -(-(n - 1) // (k + 1)), stats
    print(f"SAME-MODEL k={k} OK", flush=True)


def check_int4_draft_exact_parity(quant_params, draft_params, rng):
    """A DIFFERENT draft (int4 of the same weights) still yields the
    target's exact greedy sequence — acceptance only changes speed."""
    prompt = _tokens(rng, 2, 8)
    n = 16
    ref = greedy_generate(quant_params, TINY, prompt, n)
    toks, stats = spec_generate(
        quant_params, TINY, draft_params, TINY, prompt, n, k=3,
        return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    assert stats["rounds"] >= -(-(n - 1) // 4)  # at least the all-accept floor
    print("INT4-DRAFT PARITY OK", flush=True)


def check_batch_rows_diverge(quant_params, draft_params, rng):
    """Batch rows accept different counts per round (per-row dynamic
    positions) yet each row matches its own greedy decode."""
    prompt = _tokens(rng, 3, 8)
    n = 10
    ref = greedy_generate(quant_params, TINY, prompt, n)
    toks = spec_generate(
        quant_params, TINY, draft_params, TINY, prompt, n, k=2
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    print("BATCH-DIVERGE PARITY OK", flush=True)


def check_sampled_draft_exact_parity(quant_params, draft_params, rng):
    """SAMPLED draft-model speculation: positional PRNG makes the output
    exactly the plain positionally-sampled decode with the same key."""
    prompt = _tokens(rng, 2, 8)
    n = 12
    key = jax.random.PRNGKey(11)
    ref = positional_generate(
        quant_params, TINY, prompt, n, temperature=0.8, top_k=5, key=key
    )
    toks = spec_generate(
        quant_params, TINY, draft_params, TINY, prompt, n, k=3,
        temperature=0.8, top_k=5, key=key,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    print("SAMPLED-DRAFT PARITY OK", flush=True)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    dense = random_dense_params(TINY, jax.random.PRNGKey(3), dtype=jnp.float32)
    qp = quantize_params(dense)
    dp = quantize_params(dense, bits=4)
    rng = np.random.default_rng(0)
    if only in ("all", "same"):
        check_same_model_accepts_everything(qp, np.random.default_rng(0), 1)
        check_same_model_accepts_everything(qp, np.random.default_rng(0), 3)
    if only in ("all", "int4"):
        check_int4_draft_exact_parity(qp, dp, np.random.default_rng(0))
    if only in ("all", "diverge"):
        check_batch_rows_diverge(qp, dp, np.random.default_rng(0))
    if only in ("all", "sampled"):
        check_sampled_draft_exact_parity(qp, dp, np.random.default_rng(0))
    print("ALL SPEC CHECKS PASS", flush=True)
