"""Flash-attention kernel vs masked-softmax oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.kernels.flash_attention import flash_attention
from eetq_tpu.modules.attention import attention_reference, causal_mask


def _qkv(rng, b, s, hq, hkv, d, skv=None):
    skv = skv or s
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize(
    "b,s,hq,hkv,d",
    [
        (1, 128, 4, 4, 64),    # MHA
        (2, 256, 8, 2, 64),    # GQA 4:1
        (1, 300, 4, 1, 128),   # MQA, unaligned seq
        (1, 8, 4, 4, 64),      # tiny seq (below one block)
    ],
)
def test_causal_matches_reference(rng, b, s, hq, hkv, d):
    q, k, v = _qkv(rng, b, s, hq, hkv, d)
    scale = 1.0 / d**0.5
    out = flash_attention(q, k, v, causal=True)
    ref = attention_reference(q, k, v, causal_mask(s), scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_non_causal(rng):
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64)
    out = flash_attention(q, k, v, causal=False)
    ref = attention_reference(q, k, v, None, 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_sliding_window(rng):
    s, w = 256, 64
    q, k, v = _qkv(rng, 1, s, 4, 4, 64)
    out = flash_attention(q, k, v, causal=True, window=w)
    ref = attention_reference(q, k, v, causal_mask(s, window=w), 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


def test_bf16(rng):
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, k, v, causal_mask(128), 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=2e-2
    )


def test_cross_attention_lengths(rng):
    """Sq != Skv (chunked prefill shape)."""
    q, k, v = _qkv(rng, 1, 128, 4, 4, 64, skv=384)
    out = flash_attention(q, k, v, causal=False)
    ref = attention_reference(q, k, v, None, 1.0 / 8.0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-3
    )


# ---- backward (custom VJP: recompute-based flash-2) ----


def _grad_pair(loss_flash, loss_ref, args):
    import jax

    gf = jax.grad(loss_flash, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for name, a, b in zip("qkv", gf, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9
        )
        assert rel < 2e-3, (name, rel)


@pytest.mark.parametrize(
    "hq,hkv,window",
    [(4, 4, None), (8, 2, None), (4, 4, 64)],
)
def test_backward_matches_reference_vjp(rng, hq, hkv, window):
    """Flash VJP == attention_reference VJP (the reference relies on
    flash-attn's differentiable CUDA kernel, llama_modules.py:132-141)."""
    s, d = 256, 64
    q, k, v = _qkv(rng, 1, s, hq, hkv, d)
    scale = 1.0 / d**0.5

    def lf(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window=window,
                            block_q=128, block_kv=128).astype(jnp.float32)
            ** 2
        )

    def lr(q, k, v):
        return jnp.sum(
            attention_reference(
                q, k, v, causal_mask(s, window=window), scale
            ).astype(jnp.float32)
            ** 2
        )

    _grad_pair(lf, lr, (q, k, v))


def test_backward_alibi(rng):
    from eetq_tpu.ops import alibi_slopes

    s, hq, d = 256, 4, 64
    q, k, v = _qkv(rng, 1, s, hq, hq, d)
    sl = jnp.asarray(alibi_slopes(hq))
    scale = 1.0 / d**0.5

    def lf(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, slopes=sl, block_q=128,
                            block_kv=128).astype(jnp.float32) ** 2
        )

    def lr(q, k, v):
        return jnp.sum(
            attention_reference(q, k, v, causal_mask(s), scale,
                                slopes=sl).astype(jnp.float32) ** 2
        )

    _grad_pair(lf, lr, (q, k, v))


def test_lora_backward_flash_s1024(rng):
    """LoRA finetuning through the MODEL forward with use_flash=True at
    S=1024: grads through the flash VJP match the use_flash=False
    (attention_reference AD) path. This is the reference's
    LoRA-over-frozen-quantized training capability with flash memory
    behavior (qlinear.py:64-94 + flash_attn_func)."""
    import dataclasses

    import jax

    from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
    from eetq_tpu.models.transformer import forward
    from eetq_tpu.modules.linear import LoraAdapter

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16, max_position=1024,
    )
    params = quantize_params(
        random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    r = 4
    lora = LoraAdapter(
        lora_a=jnp.asarray(
            rng.standard_normal((cfg.hidden_size, r)).astype(np.float32) * 0.02
        ),
        lora_b=jnp.asarray(
            rng.standard_normal((r, cfg.qkv_out)).astype(np.float32) * 0.02
        ),
        scaling=1.0,
    )
    s = 1024
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, size=(1, s)), jnp.int32
    )
    pos = jnp.arange(s, dtype=jnp.int32)[None]

    def loss(lora, use_flash):
        lp = dataclasses.replace(params.layers[0], qkv_lora=lora)
        p = dataclasses.replace(params, layers=[lp])
        logits, _ = forward(p, cfg, toks, pos, None, jnp.int32(0),
                            use_flash=use_flash)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    gf = jax.grad(lambda l: loss(l, True))(lora)
    gr = jax.grad(lambda l: loss(l, False))(lora)
    for name in ("lora_a", "lora_b"):
        a, b = getattr(gf, name), getattr(gr, name)
        assert float(jnp.abs(a).sum()) > 0
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9
        )
        assert rel < 5e-2, (name, rel)
