"""Grid-preserving QuantizedArray op registrations — the widened set.

Parity: reference `_linear_quantized_ops.py:92-240` (metadata-preserving
shape ops with per-channel predicates, scalar mul rescaling, quantized cat).
Each op must (a) keep the result a QuantizedArray without touching the raw
grid beyond the op's own shape/sign semantics, and (b) dequantize to the
same values as the op applied to the dequantized input.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu import ops
from fastforward_tpu.quantization.affine_function import (
    quantize_per_channel,
    quantize_per_tensor,
)
from fastforward_tpu.quantization.granularity import PerChannel
from fastforward_tpu.quantization.quantized_array import QuantizedArray


def _pt(x, scale=0.05):
    return quantize_per_tensor(jnp.asarray(x), scale)


def _pc(x, dim, scales):
    return quantize_per_channel(jnp.asarray(x), dim, jnp.asarray(scales))


@pytest.fixture
def x34():
    return np.linspace(-1.0, 1.0, 12, dtype=np.float32).reshape(3, 4)


# --- per-channel shape ops ----------------------------------------------------


def test_permute_per_channel_remaps_channel_dim(x34):
    q = _pc(x34, 0, [0.02, 0.05, 0.08])
    out = ops.permute(q, (1, 0))
    assert isinstance(out, QuantizedArray)
    gran = out.quantization_context.quantization_params.granularity
    assert isinstance(gran, PerChannel) and gran.channel_dims == (1,)
    np.testing.assert_allclose(out.dequantize(), q.dequantize().T, rtol=1e-6)
    # raw grid untouched (just transposed)
    np.testing.assert_array_equal(np.asarray(out.raw_data), np.asarray(q.raw_data).T)


def test_transpose_per_channel_tracks_channel(x34):
    q = _pc(x34, 1, [0.02, 0.05, 0.08, 0.03])
    out = ops.transpose(q, 0, 1)
    gran = out.quantization_context.quantization_params.granularity
    assert gran.channel_dims == (0,)
    np.testing.assert_allclose(out.dequantize(), q.dequantize().T, rtol=1e-6)


def test_cat_per_channel_along_channel_dim_concats_scales(x34):
    qa = _pc(x34, 0, [0.02, 0.05, 0.08])
    qb = _pc(x34 * 2.0, 0, [0.04, 0.1, 0.16])
    out = ops.cat([qa, qb], dim=0)
    assert isinstance(out, QuantizedArray)
    params = out.quantization_context.quantization_params
    np.testing.assert_allclose(
        np.asarray(params.scale).reshape(-1),
        [0.02, 0.05, 0.08, 0.04, 0.1, 0.16],
        rtol=1e-6,
    )
    ref = jnp.concatenate([qa.dequantize(), qb.dequantize()], axis=0)
    np.testing.assert_allclose(out.dequantize(), ref, rtol=1e-6)


def test_cat_per_channel_off_channel_dim_falls_back(x34):
    # different grids along a non-channel dim -> dequantize fallback (plain
    # array out), not silent grid corruption
    qa = _pc(x34, 0, [0.02, 0.05, 0.08])
    qb = _pc(x34, 0, [0.03, 0.06, 0.09])
    from fastforward_tpu import flags

    with flags.strict_quantization(False):
        out = ops.cat([qa, qb], dim=1)
    assert not isinstance(out, QuantizedArray)


# --- sign / scalar ops ----------------------------------------------------------


def test_negative_symmetric_flips_grid(x34):
    q = _pt(x34)
    out = ops.negative(q)
    assert isinstance(out, QuantizedArray)
    np.testing.assert_allclose(out.dequantize(), -q.dequantize(), rtol=1e-6)


def test_negative_saturates_int_min():
    # -(-128) would overflow int8; the kernel must saturate to +127
    q = quantize_per_tensor(jnp.asarray([-6.4, 0.0, 6.35]), 0.05)
    raw = np.asarray(q.raw_data)
    assert raw.min() == -128
    out = ops.negative(q)
    out_raw = np.asarray(out.raw_data)
    assert out_raw.max() <= 127
    np.testing.assert_allclose(
        out.dequantize(),
        np.clip(-np.asarray(q.dequantize()), -128 * 0.05, 127 * 0.05),
        rtol=1e-6,
    )


def test_operator_neg_routes_to_grid_kernel(x34):
    q = _pt(x34)
    out = -q
    assert isinstance(out, QuantizedArray)
    np.testing.assert_allclose(out.dequantize(), -q.dequantize(), rtol=1e-6)


def test_positive_is_identity(x34):
    q = _pt(x34)
    out = ops.positive(q)
    assert isinstance(out, QuantizedArray)
    np.testing.assert_array_equal(np.asarray(out.raw_data), np.asarray(q.raw_data))


def test_div_scalar_rescales(x34):
    q = _pt(x34)
    out = ops.div(q, 4.0)
    assert isinstance(out, QuantizedArray)
    np.testing.assert_array_equal(np.asarray(out.raw_data), np.asarray(q.raw_data))
    np.testing.assert_allclose(out.dequantize(), q.dequantize() / 4.0, rtol=1e-6)


def test_truediv_operator_routes(x34):
    q = _pt(x34)
    out = q / 2.0
    assert isinstance(out, QuantizedArray)
    np.testing.assert_allclose(out.dequantize(), q.dequantize() / 2.0, rtol=1e-6)


def test_rmul_scalar(x34):
    q = _pt(x34)
    out = 3.0 * q
    assert isinstance(out, QuantizedArray)
    np.testing.assert_allclose(out.dequantize(), q.dequantize() * 3.0, rtol=1e-6)


# --- padding ---------------------------------------------------------------------


def test_pad_zero_stays_on_grid(x34):
    q = _pt(x34)
    out = ops.pad(q, (1, 2))  # pad last dim
    assert isinstance(out, QuantizedArray)
    assert out.shape == (3, 7)
    ref = jnp.pad(q.dequantize(), ((0, 0), (1, 2)))
    np.testing.assert_allclose(out.dequantize(), ref, rtol=1e-6)


def test_pad_nonzero_value_falls_back(x34):
    from fastforward_tpu import flags

    q = _pt(x34)
    with flags.strict_quantization(False):
        out = ops.pad(q, (1, 1), value=0.5)
    assert not isinstance(out, QuantizedArray)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], 0.5, rtol=1e-6
    )
