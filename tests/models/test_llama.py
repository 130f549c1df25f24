"""Llama model tests: forward shapes, KV-cache consistency, conversion,
calibration (the tiny-config analog of BASELINE configs 2-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn, range_setting
from fastforward_tpu.models import LlamaConfig, LlamaForCausalLM, QuantizedLlamaAttention
from fastforward_tpu.serving import KVCache


@pytest.fixture(scope="module")
def tiny_model():
    return LlamaForCausalLM(LlamaConfig.tiny(), rngs=nnx.Rngs(0))


def _cache(config, batch, max_len=32, quantized=False):
    return KVCache.create(
        num_layers=config.num_layers,
        batch_size=batch,
        max_len=max_len,
        num_kv_heads=config.num_kv_heads,
        head_dim=config.head_dim,
        dtype=jnp.float32,
        quantized=quantized,
    )


def test_forward_shape(tiny_model):
    ids = jnp.array([[1, 2, 3, 4]])
    logits, cache = tiny_model(ids)
    assert logits.shape == (1, 4, 256)
    assert cache is None


def test_prefill_and_decode_match_full_forward(tiny_model):
    config = tiny_model.config
    ids = jnp.array([[5, 17, 3, 250, 42, 7]])
    full_logits, _ = tiny_model(ids)

    # Prefill the first 4 tokens, then decode 2 incrementally
    cache = _cache(config, 1)
    logits_p, cache = tiny_model(ids[:, :4], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :4]), rtol=2e-2, atol=2e-3
    )
    for t in range(4, 6):
        step_logits, cache = tiny_model(ids[:, t : t + 1], cache=cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=2e-2,
            atol=2e-3,
        )


def test_int8_kv_cache_close_to_fp(tiny_model):
    config = tiny_model.config
    ids = jnp.array([[5, 17, 3, 250, 42, 7, 99, 123]])
    cache_fp = _cache(config, 1)
    cache_q = _cache(config, 1, quantized=True)
    logits_fp, _ = tiny_model(ids, cache=cache_fp)
    logits_q, _ = tiny_model(ids, cache=cache_q)
    # INT8 KV introduces small error; logits stay close
    err = np.abs(np.asarray(logits_fp) - np.asarray(logits_q))
    scale = np.abs(np.asarray(logits_fp)).max()
    assert err.max() / scale < 0.05


def test_decode_under_jit(tiny_model):
    config = tiny_model.config
    graphdef, state = nnx.split(tiny_model)

    @jax.jit
    def decode_step(state, token, cache):
        model = nnx.merge(graphdef, state)
        logits, cache = model(token, cache=cache)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    cache = _cache(config, 1)
    token = jnp.array([[3]])
    for _ in range(4):
        nxt, cache = decode_step(state, token, cache)
        token = nxt[:, None]
    assert int(cache.length) == 4


def test_quantize_model_converts_llama(tiny_model):
    model = LlamaForCausalLM(LlamaConfig.tiny(), rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    assert isinstance(model.layers[0].self_attn, QuantizedLlamaAttention)
    assert isinstance(model.layers[0].self_attn.q_proj, ffnn.QuantizedLinear)
    assert isinstance(model.layers[0].input_layernorm, ffnn.QuantizedRMSNorm)
    # Stub quantizers pass through: same logits as the unconverted model
    ids = jnp.array([[1, 2, 3]])
    ref = LlamaForCausalLM(LlamaConfig.tiny(), rngs=nnx.Rngs(0))
    with ff.strict_quantization(False):
        out, _ = model(ids)
    expected, _ = ref(ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_llama_w8a8_calibration_sqnr():
    """Tiny-config version of BASELINE config 2: W8A8 per-channel with
    min-max calibration; quantized logits stay close to fp."""
    model = LlamaForCausalLM(LlamaConfig.tiny(), rngs=nnx.Rngs(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, size=(2, 16)))
    fp_logits, _ = model(ids)

    ffnn.quantize_model(model)
    config = ff.QuantizationConfig()
    config.add_rule("**/[quantizer:parameter]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=True)
    config.add_rule("**/[cls:Linear]/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=True, granularity=ff.PerChannel(1))
    config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(model)

    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(ids)
        q_logits, _ = model(ids)

    s = float(ff.sqnr(fp_logits, q_logits))
    assert s > 20, f"W8A8 sqnr too low: {s}"
