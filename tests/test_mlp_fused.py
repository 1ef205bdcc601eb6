"""Fused MLP decode kernel tests: one-dispatch norm+gate/up+swiglu+down
(+residual) must match the separate-kernel path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.modules.linear import linear_apply, quantize_linear
from eetq_tpu.ops.mlp import can_fuse_mlp, fused_mlp
from eetq_tpu.ops.rmsnorm import rmsnorm

K, I, N = 512, 768, 512  # I % 256 == 0


@pytest.fixture(scope="module")
def layers(rng=np.random.default_rng(0)):
    gu = quantize_linear(
        jnp.asarray(rng.standard_normal((K, 2 * I)).astype(np.float32) / 23)
    )
    down = quantize_linear(
        jnp.asarray(rng.standard_normal((I, N)).astype(np.float32) / 28)
    )
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(K).astype(np.float32))
    return gu, down, gamma


def _two_kernel_path(gu, down, gamma, x, activation="silu", residual=None):
    y = rmsnorm(x, gamma, eps=1e-6)
    gateup = linear_apply(gu, y)
    gate, up = jnp.split(gateup, 2, axis=-1)
    act = {"silu": jax.nn.silu, "gelu": jax.nn.gelu,
           "relu": jax.nn.relu}[activation]
    h = (act(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)
    out = linear_apply(down, h)
    if residual is not None:
        out = out + residual
    return out


@pytest.mark.parametrize("m", [1, 4, 8])
def test_fused_matches_two_kernel_path(layers, m, rng):
    gu, down, gamma = layers
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    assert can_fuse_mlp(gu, down, m)
    out = fused_mlp(gu, down, x, gamma, eps=1e-6)
    ref = _two_kernel_path(gu, down, gamma, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    # and the jnp oracle path
    oracle = fused_mlp(gu, down, x, gamma, eps=1e-6, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(oracle, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_residual_and_lead_dims(layers, rng):
    gu, down, gamma = layers
    x = jnp.asarray(
        rng.standard_normal((1, 2, K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    res = jnp.asarray(
        rng.standard_normal((1, 2, N)).astype(np.float32)
    ).astype(jnp.bfloat16)
    out = fused_mlp(gu, down, x, gamma, eps=1e-6, residual=res)
    ref = _two_kernel_path(gu, down, gamma, x, residual=res)
    assert out.shape == (1, 2, N)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("m", [1, 5])
def test_fused_int4_matches_two_kernel_path(rng, m):
    """int4 per-channel variant: nibble-split K on gate/up AND nibble-split
    intermediate rows on down (the h_a/h_b two-range structure)."""
    k, i, n = 512, 512, 256  # I/2 = 256, % 128 == 0
    gu = quantize_linear(
        jnp.asarray(rng.standard_normal((k, 2 * i)).astype(np.float32) / 23),
        bits=4,
    )
    down = quantize_linear(
        jnp.asarray(rng.standard_normal((i, n)).astype(np.float32) / 28),
        bits=4,
    )
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(k).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    assert can_fuse_mlp(gu, down, m)
    out = fused_mlp(gu, down, x, gamma, eps=1e-6)
    ref = _two_kernel_path(gu, down, gamma, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=4e-2, atol=4e-2,
    )
    oracle = fused_mlp(gu, down, x, gamma, eps=1e-6, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(oracle, np.float32),
        rtol=4e-2, atol=4e-2,
    )


def test_can_fuse_gates():
    gu, down, _ = (None, None, None)
    from eetq_tpu.modules.linear import DenseLinear

    d = DenseLinear(weight=jnp.zeros((I, N), jnp.bfloat16))
    q = quantize_linear(jnp.ones((K, 2 * I), jnp.float32))
    qd = quantize_linear(jnp.ones((I, N), jnp.float32))
    assert can_fuse_mlp(q, qd, 8)
    assert not can_fuse_mlp(q, qd, 16)  # prefill rows
    assert not can_fuse_mlp(q, d, 1)  # dense down
    q4 = quantize_linear(jnp.ones((K, 2 * I), jnp.float32), bits=4)
    assert not can_fuse_mlp(q4, qd, 1)  # mixed int4/int8 rejected
    qg = quantize_linear(jnp.ones((I, N), jnp.float32), group_size=64)
    assert not can_fuse_mlp(q, qg, 1)  # group-wise stays off
    # unaligned intermediate dim (I=250 not % 256)
    qu = quantize_linear(jnp.ones((K, 500), jnp.float32))
    qud = quantize_linear(jnp.ones((250, N), jnp.float32))
    assert not can_fuse_mlp(qu, qud, 1)


def test_decoder_layer_env_toggle(rng, monkeypatch):
    """EETQ_FUSED_MLP=1 routes decode steps through the fused kernel with
    unchanged outputs (fresh trace per toggle via distinct shapes)."""
    from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
    from eetq_tpu.models.transformer import forward

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=64,
    )
    params = quantize_params(
        random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    toks = jnp.asarray([[5, 9, 3]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    base, _ = forward(params, cfg, toks, pos, None, 0)
    monkeypatch.setenv("EETQ_FUSED_MLP", "1")
    # use jnp.copy shapes identical -> same jit cache would reuse the OLD
    # trace; call the underlying forward_inner with a fresh jit instead
    import functools

    from eetq_tpu.models.transformer import forward_inner

    fresh = jax.jit(
        functools.partial(forward_inner, cfg=cfg),
        static_argnames=(),
    )
    fused, _ = fresh(params, tokens=toks, positions=pos, caches=None,
                     offset=jnp.int32(0))
    a, b = np.asarray(base, np.float32), np.asarray(fused, np.float32)
    assert np.abs(a - b).mean() < 0.05
    assert (a.argmax(-1) == b.argmax(-1)).all()
