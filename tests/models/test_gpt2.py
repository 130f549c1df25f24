"""GPT-2 tests + the BASELINE config 1 MLP parity milestone."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn, range_setting
from fastforward_tpu.models import GPT2Config, GPT2LMHead, MLP, QuantizedGPT2Attention


def test_gpt2_forward_shape():
    model = GPT2LMHead(GPT2Config.tiny(), rngs=nnx.Rngs(0))
    ids = jnp.array([[1, 2, 3, 4, 5]])
    logits = model(ids)
    assert logits.shape == (1, 5, 256)


def test_gpt2_conversion_and_stub_passthrough():
    model = GPT2LMHead(GPT2Config.tiny(), rngs=nnx.Rngs(0))
    ids = jnp.array([[1, 2, 3]])
    expected = np.asarray(model(ids))
    ffnn.quantize_model(model)
    assert isinstance(model.blocks[0].attn, QuantizedGPT2Attention)
    with ff.strict_quantization(False):
        out = model(ids)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_gpt2_w8a8_calibration():
    """BASELINE config 2 (tiny): GPT-2 W8A8 per-channel, min-max calibration."""
    model = GPT2LMHead(GPT2Config.tiny(), rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 256, size=(2, 16)))
    fp_logits = model(ids)

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
        q_logits = model(ids)
    s = float(ff.sqnr(fp_logits, q_logits))
    assert s > 20, f"GPT-2 W8A8 sqnr too low: {s}"


def test_mlp_int8_parity_config1():
    """BASELINE config 1: 2-layer MLP, per-tensor INT8 static quant —
    quantize→dequantize→matmul parity vs FP32."""
    model = MLP(16, 32, 8, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16), dtype=jnp.float32)
    fp_out = np.asarray(model(x))

    ffnn.quantize_model(model)
    config = ff.QuantizationConfig()
    config.add_rule("**/[quantizer:parameter]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=True)
    config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(model)
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(x)
        q_out = model(x)
    q_out = q_out.dequantize() if isinstance(q_out, ff.QuantizedArray) else q_out
    s = float(ff.sqnr(fp_out, q_out))
    assert s > 25, f"MLP INT8 parity too weak: sqnr={s}"
