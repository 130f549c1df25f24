"""LinearQuantizer tests. Modeled on reference `tests/nn/test_linear_quantizer.py`."""

import jax.numpy as jnp
import numpy as np
import pytest

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn


def test_lazy_params_raise_before_range():
    q = ffnn.LinearQuantizer(num_bits=8)
    assert q.has_uninitialized_params
    with pytest.raises(ff.QuantizationError, match="uninitialized|range"):
        q(jnp.ones(3))


def test_symmetric_range_sets_scale_no_offset():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=True, allow_one_sided=False)
    q.quantization_range = (-2.0, 2.0)
    assert q.offset is None
    # Scale covers the widest side: max(|min|/128, |max|/127) = 2/127
    np.testing.assert_allclose(float(q.scale.value[0]), 2.0 / 127)


def test_asymmetric_range_sets_offset():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=False)
    q.quantization_range = (-1.0, 3.0)
    assert q.offset is not None
    mn, mx = q.quantization_range
    np.testing.assert_allclose(float(np.asarray(mn).squeeze()), -1.0, rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(mx).squeeze()), 3.0, rtol=1e-5)


def test_one_sided_range():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=True, allow_one_sided=True)
    q.quantization_range = (0.0, 4.0)
    # one-sided: offset pinned at integer minimum
    np.testing.assert_allclose(float(q.offset.value[0]), 128.0)


def test_quantize_produces_quantized_array():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=True, allow_one_sided=False)
    q.quantization_range = (-1.0, 1.0)
    data = jnp.array([0.5, -0.25])
    out = q(data)
    assert isinstance(out, ff.QuantizedArray)
    np.testing.assert_allclose(np.asarray(out.dequantize()), [0.5, -0.25], atol=1e-2)


def test_per_channel_quantizer():
    q = ffnn.LinearQuantizer(
        num_bits=8, granularity=ff.PerChannel(0), symmetric=True, allow_one_sided=False
    )
    q.quantization_range = (jnp.array([-1.0, -2.0]), jnp.array([1.0, 2.0]))
    data = jnp.array([[0.5, -0.5], [1.5, -1.5]])
    out = q(data)
    np.testing.assert_allclose(np.asarray(out.dequantize()), np.asarray(data), atol=0.02)


def test_dynamic_quantizer_no_state():
    q = ffnn.DynamicLinearQuantizer(num_bits=8)
    data = jnp.asarray(np.random.randn(4, 4), dtype=jnp.float32)
    out = q(data)
    assert isinstance(out, ff.QuantizedArray)
    assert np.abs(np.asarray(out.dequantize()) - np.asarray(data)).max() < 0.05


def test_operator_for_range():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=False)
    ctx = q.operator_for_range(-1.0, 1.0, (4,))
    out = ctx.quantize(jnp.array([0.5]))
    assert isinstance(out, ff.QuantizedArray)


def test_override_stack():
    q = ffnn.LinearQuantizer(num_bits=8, symmetric=True, allow_one_sided=False)
    q.quantization_range = (-1.0, 1.0)
    seen = []

    def spy_override(ctx, inner, args, kwargs):
        seen.append(np.asarray(args[0]).copy())
        return inner(*args, **kwargs)

    handle = q.register_override(spy_override)
    q(jnp.array([0.5]))
    assert len(seen) == 1
    handle.remove()
    q(jnp.array([0.5]))
    assert len(seen) == 1
