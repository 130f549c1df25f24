"""Range estimation tests. Modeled on reference
`tests/range_setting/test_minmax.py` and `test_minerror.py`."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn, range_setting
from fastforward_tpu.overrides import disable_quantization
from fastforward_tpu.quant_init import QuantizationConfig
from fastforward_tpu.utils.metrics import sqnr


class MLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(8, 16, rngs=rngs)
        self.fc2 = nnx.Linear(16, 4, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        return self.fc2(h.dequantize() if isinstance(h, ff.QuantizedArray) else h)


@pytest.fixture
def model():
    m = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(m)
    config = QuantizationConfig()
    config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=True, granularity=ff.PerChannel(1))
    config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(m)
    return m


def _batches(n=4, shape=(16, 8)):
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(*shape), dtype=jnp.float32) for _ in range(n)]


def test_running_minmax_estimates_ranges(model):
    # GIVEN an uninitialized quantized model
    assert model.fc1.weight_quantizer.has_uninitialized_params
    # WHEN calibrating with running min-max
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            for batch in _batches():
                model(batch)
    # THEN every quantizer has a range
    assert not model.fc1.weight_quantizer.has_uninitialized_params
    assert not model.fc1.input_quantizer.has_uninitialized_params
    mn, mx = model.fc1.input_quantizer.quantization_range
    assert float(np.asarray(mn).min()) < 0 < float(np.asarray(mx).max())


def test_running_minmax_covers_data(model):
    batches = _batches()
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            for batch in batches:
                model(batch)
    mn, mx = model.fc1.input_quantizer.quantization_range
    data_min = min(float(np.asarray(b).min()) for b in batches)
    data_max = max(float(np.asarray(b).max()) for b in batches)
    # asymmetric quantizer: range ends within half a bin of the data extremes
    assert float(np.asarray(mn).squeeze()) <= data_min + 1e-5
    assert float(np.asarray(mx).squeeze()) >= data_max - 1e-5


def test_smoothed_minmax_ema(model):
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(
            model, range_setting.smoothed_minmax, gamma=0.5
        ):
            for batch in _batches():
                model(batch)
    assert not model.fc1.input_quantizer.has_uninitialized_params


def test_estimator_removed_after_context(model):
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(_batches(1)[0])
        assert not model.fc1.weight_quantizer.has_overrides


def test_mse_grid_beats_or_matches_naive_on_outliers(model):
    # GIVEN data with a large outlier — minmax wastes grid on it
    rng = np.random.RandomState(0)
    data = rng.randn(64, 8).astype(np.float32)
    data[0, 0] = 40.0

    q_minmax = ffnn.LinearQuantizer(num_bits=8, symmetric=False)
    q_mse = ffnn.LinearQuantizer(num_bits=8, symmetric=False)

    class One(nnx.Module):
        def __init__(self, q):
            self.q = q

        def __call__(self, x):
            return self.q(x)

    m1, m2 = One(q_minmax), One(q_mse)
    x = jnp.asarray(data)
    with range_setting.estimate_ranges(m1, range_setting.running_minmax):
        m1(x)
    with range_setting.estimate_ranges(m2, range_setting.min_error_grid, num_candidates=60):
        m2(x)

    sqnr_minmax = float(sqnr(x, q_minmax(x)))
    sqnr_mse = float(sqnr(x, q_mse(x)))
    assert sqnr_mse >= sqnr_minmax


def test_per_channel_ranges(model):
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(_batches(1)[0])
    # weight quantizer is per-channel over dim 1 (out features of (in, out))
    scale = model.fc1.weight_quantizer.scale.value
    assert scale.shape == (16,)


def test_disable_quantization_context(model):
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(_batches(1)[0])
    x = _batches(1)[0]
    with disable_quantization(model):
        out = model.fc1(x)
    # Quantizers short-circuit: plain array out
    assert not isinstance(out, ff.QuantizedArray)


def test_calibrated_model_sqnr(model):
    batches = _batches()
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            for b in batches:
                model(b)
    x = batches[0]
    q = model.fc1.input_quantizer(x)
    assert float(sqnr(x, q)) > 30  # 8-bit quantization ≈ 6dB/bit minus overhead
