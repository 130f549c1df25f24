"""End-to-end quantization of a small conv net.

Parity: reference tutorial `docs/examples/quantizing_networks.nb.py` — the
convert → place quantizers → calibrate → quantized inference flow on a conv
model (reference `QuantizedConv2d`, `nn/conv.py:51`). Exercises
QuantizedConv and QuantizedRelu end to end, not just the ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu import range_setting
from fastforward_tpu.quant_init import find_quantizers
from fastforward_tpu.testing import sqnr


class SmallConvNet(nnx.Module):
    def __init__(self, *, rngs):
        self.conv1 = nnx.Conv(3, 8, kernel_size=(3, 3), rngs=rngs)
        self.conv2 = nnx.Conv(8, 16, kernel_size=(3, 3), strides=(2, 2), rngs=rngs)
        self.head = nnx.Linear(16, 10, rngs=rngs)

    def __call__(self, x):  # x: (B, H, W, C) channels-last
        x = jax.nn.relu(self.conv1(x))
        x = jax.nn.relu(self.conv2(x))
        x = jnp.mean(x, axis=(1, 2))
        return self.head(x)


def _quantize_and_calibrate(model, batches):
    ffnn.quantize_model(model)
    find_quantizers(model, "**/[quantizer:parameter/weight]").initialize(
        ffnn.LinearQuantizer, num_bits=8, symmetric=True
    )
    find_quantizers(model, "**/input_quantizer").initialize(
        ffnn.LinearQuantizer, num_bits=8, symmetric=False
    )
    # Calibration runs non-strict: output quantizers on module boundaries
    # are still stubs while ranges are being collected (the reference
    # estimates with quantization disabled, `minmax.py:128-146`).
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            for batch in batches:
                model(batch)


def _calibration_batches(n=4, batch=2, size=16):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(batch, size, size, 3), jnp.float32) for _ in range(n)]


def test_convnet_quantize_calibrate_infer():
    # GIVEN a conv net and its fp reference output
    model = SmallConvNet(rngs=nnx.Rngs(0))
    batches = _calibration_batches()
    fp_out = np.asarray(model(batches[0]))

    # WHEN converting, placing W8A8 per-tensor quantizers on weights and op
    # inputs, and calibrating. (The model body's plain `jax.nn.relu` /
    # `jnp.mean` calls stay unquantized — as in the reference, converting
    # only swaps modules; rewriting function calls is autoquant's job — so
    # inference runs non-strict.)
    _quantize_and_calibrate(model, batches)
    assert isinstance(model.conv1, ffnn.QuantizedConv)

    with ff.strict_quantization(False):
        q_out = np.asarray(model(batches[0]))

    # THEN the quantized output tracks the fp output at 8-bit fidelity
    assert q_out.shape == fp_out.shape
    assert float(sqnr(fp_out, q_out)) > 20.0


def test_convnet_jits_and_matches_eager():
    model = SmallConvNet(rngs=nnx.Rngs(0))
    batches = _calibration_batches(n=2)
    _quantize_and_calibrate(model, batches)

    with ff.strict_quantization(False):
        eager = np.asarray(model(batches[0]))
        jitted = np.asarray(nnx.jit(lambda m, x: m(x))(model, batches[0]))
    np.testing.assert_allclose(eager, jitted, rtol=2e-2, atol=2e-2)


class QATConvBlock(nnx.Module):
    """Quantization-aware definition: activations are quantized modules, so
    the whole block runs under strict quantization."""

    def __init__(self, *, rngs):
        self.conv = nnx.Conv(3, 8, kernel_size=(3, 3), rngs=rngs)
        self.act = ffnn.QuantizedRelu()

    def __call__(self, x):
        return self.act(self.conv(x))


def test_quantized_relu_block_strict():
    # GIVEN a quantization-aware block using QuantizedRelu
    model = QATConvBlock(rngs=nnx.Rngs(0))
    batches = _calibration_batches(n=2)
    with ff.strict_quantization(False):  # stub quantizers, pre-initialization
        fp_out = np.asarray(model(batches[0]))

    ffnn.quantize_model(model)
    # Initialize EVERY quantizer slot — the path is fully quantized.
    find_quantizers(model, "**/[quantizer:parameter/weight]").initialize(
        ffnn.LinearQuantizer, num_bits=8, symmetric=True
    )
    find_quantizers(model, "**/[quantizer:activation]").initialize(
        ffnn.LinearQuantizer, num_bits=8, symmetric=False
    )
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            for batch in batches:
                model(batch)

    # THEN strict quantized inference works end to end
    with ff.strict_quantization(True):
        out = model(batches[0])
    q_out = np.asarray(out.dequantize() if hasattr(out, "dequantize") else out)
    assert float(sqnr(fp_out, q_out)) > 20.0
