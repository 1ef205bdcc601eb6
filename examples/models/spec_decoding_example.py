"""Speculative decoding walkthrough: draft-model and prompt-lookup
speculation over a quantized target (a beyond-reference capability — the
reference delegates its decode loop to HF `transformers.generate`,
`python/eetq/models/base.py:65-72`).

Run from the repo root: python examples/models/spec_decoding_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.serve import greedy_generate, ngram_spec_generate, spec_generate

CFG = ModelConfig(
    vocab_size=1024, hidden_size=512, intermediate_size=1408, num_layers=4,
    num_heads=8, num_kv_heads=4, head_dim=64, max_position=512,
    model_type="llama",
)
PROMPT = np.arange(1, 33, dtype=np.int32)[None]


def main():
    dense = random_dense_params(CFG, jax.random.PRNGKey(0), jnp.bfloat16)
    target = quantize_params(dense)       # W8A16 serving model
    draft = quantize_params(dense, bits=4)  # W4A16 of the SAME weights

    prompt = jnp.asarray(PROMPT)
    n = 48

    ref = greedy_generate(target, CFG, prompt, n)
    print("greedy       :", np.asarray(ref)[0, :12], "...")

    # draft-model speculation: k drafts per round, ONE k+1-token verify
    # forward (m <= 8 -> same decode-GEMV regime, ~one decode step's cost)
    toks, stats = spec_generate(
        target, CFG, draft, CFG, prompt, n, k=4, return_stats=True
    )
    assert np.array_equal(np.asarray(toks), np.asarray(ref))
    print(f"spec (w4 draft): identical tokens in {stats['rounds']} rounds "
          f"({(n - 1) / stats['rounds']:.2f} tok/round, "
          f"{stats['accepted_drafts']} drafts accepted)")

    # prompt-lookup speculation: draft-free — proposes the continuation of
    # the most recent bigram match in prompt+generated history
    toks2, stats2 = ngram_spec_generate(
        target, CFG, prompt, n, k=4, return_stats=True
    )
    assert np.array_equal(np.asarray(toks2), np.asarray(ref))
    print(f"spec (ngram)   : identical tokens in {stats2['rounds']} rounds "
          f"({(n - 1) / stats2['rounds']:.2f} tok/round)")


if __name__ == "__main__":
    main()
