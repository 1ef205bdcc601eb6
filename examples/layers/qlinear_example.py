"""Module-level example — the analogue of the reference's
`examples/layers/test_qlinear.py`: QuantLinear.from a dense layer vs the
dense forward, checked at module tolerance (reference uses atol=1e-2 at
fp16, M=128).

Run from the repo root: python examples/layers/qlinear_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp
import numpy as np

from eetq_tpu.modules.linear import DenseLinear, linear_apply, quantize_linear

M, K, N = 128, 1024, 1024
rng = np.random.default_rng(12)

w = rng.standard_normal((K, N)).astype(np.float32) / np.sqrt(K)
b = rng.standard_normal((N,)).astype(np.float32) * 0.1
x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)

dense = DenseLinear(weight=jnp.asarray(w, jnp.bfloat16), bias=jnp.asarray(b))
ql = quantize_linear(jnp.asarray(w), bias=jnp.asarray(b))

out_dense = np.asarray(linear_apply(dense, x), np.float32)
out_quant = np.asarray(linear_apply(ql, x), np.float32)

err = np.abs(out_dense - out_quant)
print(f"mean abs err {err.mean():.5f}  max {err.max():.5f}")
assert np.allclose(out_dense, out_quant, atol=1e-1), "tolerance exceeded"
print("OK")
