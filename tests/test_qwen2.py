"""Qwen2 family support: qkv biases through fusion, quantization, TP
sharding, and checkpoint roundtrip."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eetq_tpu.models import ModelConfig, quantize_params, random_dense_params
from eetq_tpu.models.transformer import forward
from eetq_tpu.modules.linear import QuantLinear

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    max_position=64,
    qkv_bias=True,
    model_type="qwen2",
)


@pytest.fixture(scope="module")
def dense():
    return random_dense_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)


def test_config_from_hf():
    hf = dict(
        model_type="qwen2", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=1e6,
    )
    cfg = ModelConfig.from_hf_config(hf)
    assert cfg.qkv_bias and cfg.model_type == "qwen2"


def test_bias_survives_quantization(dense):
    assert dense.layers[0].qkv.bias is not None
    qp = quantize_params(dense)
    assert isinstance(qp.layers[0].qkv, QuantLinear)
    assert qp.layers[0].qkv.bias is not None
    np.testing.assert_array_equal(
        np.asarray(qp.layers[0].qkv.bias), np.asarray(dense.layers[0].qkv.bias)
    )


def test_bias_affects_forward(dense):
    qp = quantize_params(dense)
    nobias = dataclasses.replace(
        qp,
        layers=[
            dataclasses.replace(
                lp, qkv=dataclasses.replace(lp.qkv, bias=None)
            )
            for lp in qp.layers
        ],
    )
    toks = jnp.arange(8, dtype=jnp.int32)[None, :]
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    lg1, _ = forward(qp, CFG, toks, pos, None, jnp.int32(0))
    lg2, _ = forward(nobias, CFG, toks, pos, None, jnp.int32(0))
    assert not np.allclose(np.asarray(lg1), np.asarray(lg2))


def test_checkpoint_roundtrip_with_bias(tmp_path, dense):
    from eetq_tpu.models.hf import load_quantized, save_quantized

    qp = quantize_params(dense)
    save_quantized(qp, CFG, str(tmp_path))
    with open(os.path.join(str(tmp_path), "config.json")) as f:
        assert json.load(f)["model_type"] == "qwen2"
    cfg2, loaded = load_quantized(str(tmp_path))
    assert loaded.layers[0].qkv.bias is not None
    toks = jnp.arange(8, dtype=jnp.int32)[None, :]
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    lg1, _ = forward(qp, CFG, toks, pos, None, jnp.int32(0))
    lg2, _ = forward(loaded, cfg2, toks, pos, None, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), atol=3e-2)


def test_tp_sharded_with_bias(dense):
    from eetq_tpu.dist import make_mesh, shard_model
    from eetq_tpu.dist.sharding import make_forward_fn
    from eetq_tpu.models import init_caches

    tp = 2
    if len(jax.devices()) < tp:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(tp=tp, dp=1)
    model = shard_model(dense, CFG, mesh, quantize=True)
    fwd = make_forward_fn(model)
    b, s = 1, 8
    toks = jnp.arange(s, dtype=jnp.int32)[None, :]
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    caches = init_caches(CFG, b, 16)
    lg_sh, _ = fwd(model.params, toks, pos, caches, jnp.int32(0))
    qp = quantize_params(dense)
    lg, _ = forward(qp, CFG, toks, pos, init_caches(CFG, b, 16), jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(lg_sh), np.asarray(lg), atol=8e-2, rtol=8e-2
    )
