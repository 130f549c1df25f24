"""Affine quantization numerics tests.

Modeled on reference `tests/quantization/test_tiled_affine.py` and
`tests/quantization/affine/test_range.py` semantics: grid correctness per
granularity, range math, hand-derived LSQ/STE gradients, dynamic quant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.quantization import affine


# --- range math --------------------------------------------------------------


def test_integer_grid():
    assert affine.integer_minimum(8) == -128
    assert affine.integer_maximum(8) == 127
    assert affine.integer_minimum(4) == -8
    assert affine.integer_maximum(4) == 7


def test_quantization_range():
    mn, mx = affine.quantization_range(0.5, None, 8)
    assert mn == -64.0 and mx == 63.5
    mn, mx = affine.quantization_range(0.5, 10.0, 8)
    assert mn == (-128 + 10) * 0.5 and mx == (127 + 10) * 0.5


def test_parameters_for_range_symmetric():
    # GIVEN a symmetric range request
    scale, offset = affine.parameters_for_range(
        jnp.array(-2.0), jnp.array(1.0), 8, symmetric=True, allow_one_sided=False
    )
    # THEN the scale covers the widest side and offset is None
    assert offset is None
    np.testing.assert_allclose(float(scale), max(2.0 / 128, 1.0 / 127))


def test_parameters_for_range_asymmetric():
    scale, offset = affine.parameters_for_range(
        jnp.array(-1.0), jnp.array(2.0), 8, symmetric=False, allow_one_sided=True
    )
    np.testing.assert_allclose(float(scale), 3.0 / 255, rtol=1e-6)
    np.testing.assert_allclose(float(offset), -1.0 / (3.0 / 255) + 128, rtol=1e-6)
    # The reconstructed range matches the request
    mn, mx = affine.quantization_range(scale, offset, 8)
    np.testing.assert_allclose(float(mn), -1.0, rtol=1e-5)
    np.testing.assert_allclose(float(mx), 2.0, rtol=1e-5)


def test_parameters_for_range_one_sided():
    # GIVEN a non-negative range with one-sided allowed and symmetric requested
    scale, offset = affine.parameters_for_range(
        jnp.array(0.5), jnp.array(2.0), 8, symmetric=True, allow_one_sided=True
    )
    # THEN it is treated as asymmetric-from-zero (unsigned, Nagel et al.)
    np.testing.assert_allclose(float(scale), 2.0 / 255, rtol=1e-6)
    np.testing.assert_allclose(float(offset), 128.0, rtol=1e-6)


def test_parameters_for_range_traced_matches_eager():
    # GIVEN ranges evaluated both eagerly and under jit
    mn = jnp.array([-1.0, -3.0])
    mx = jnp.array([2.0, 0.5])

    def fn(mn, mx):
        s, o = affine.parameters_for_range(mn, mx, 8, symmetric=False, allow_one_sided=True)
        return s, o

    s_eager, o_eager = fn(mn, mx)
    s_jit, o_jit = jax.jit(fn)(mn, mx)
    np.testing.assert_allclose(np.asarray(s_eager), np.asarray(s_jit), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o_eager), np.asarray(o_jit), rtol=1e-6)


def test_can_support_bitwidth():
    assert affine.can_support_bitwidth(jnp.float32, 8)
    assert affine.can_support_bitwidth(jnp.float32, 25)
    assert not affine.can_support_bitwidth(jnp.float32, 26)
    assert affine.can_support_bitwidth(jnp.bfloat16, 9)
    assert not affine.can_support_bitwidth(jnp.bfloat16, 10)
    assert affine.can_support_bitwidth(jnp.int8, 8)
    assert not affine.can_support_bitwidth(jnp.int8, 9)
    assert affine.can_support_bitwidth(jnp.float16, 12)


# --- static quantize / dequantize -------------------------------------------


def test_quantize_per_tensor_values():
    # GIVEN simple data with scale 0.5, no offset, 8 bits
    data = jnp.array([0.0, 0.24, 0.26, -1.0, 100.0, -100.0])
    q = affine.quantize_by_tile(data, 0.5, num_bits=8)
    # THEN values are round(x/0.5) clamped to [-128, 127]
    np.testing.assert_array_equal(np.asarray(q), [0.0, 0.0, 1.0, -2.0, 127.0, -128.0])


def test_quantize_with_offset():
    data = jnp.array([1.0, 2.0, 3.0])
    # round(x/1.0 - round(10.3)) = x - 10
    q = affine.quantize_by_tile(data, 1.0, 10.3, num_bits=8)
    np.testing.assert_array_equal(np.asarray(q), [-9.0, -8.0, -7.0])


def test_quant_dequant_roundtrip_per_channel():
    # GIVEN per-channel scales over dim 0 of a (3, 4) tensor
    data = jnp.array(np.random.randn(3, 4).astype(np.float32))
    scale = jnp.array([0.01, 0.02, 0.03])
    q = affine.quantize_by_tile(data, scale, tile_size=(1, 4), num_bits=8)
    dq = affine.dequantize_by_tile(q, scale, tile_size=(1, 4))
    # THEN the error is bounded by half a bin per channel
    err = np.abs(np.asarray(dq) - np.asarray(data))
    bound = np.asarray(scale)[:, None] / 2 + 1e-7
    assert (err <= bound).all()


def test_quant_dequant_per_block():
    data = jnp.array(np.random.randn(4, 8).astype(np.float32))
    # 2x4 blocks -> 4 tiles
    scale = jnp.array([0.1, 0.2, 0.3, 0.4])
    q = affine.quantize_by_tile(data, scale, tile_size=(2, 4), num_bits=8)
    dq = affine.dequantize_by_tile(q, scale, tile_size=(2, 4))
    # Every element of block k is quantized with scale[k]
    from fastforward_tpu.quantization import tiling

    rows = tiling.tiles_to_rows(data, (2, 4))
    expected_rows = np.round(np.asarray(rows) / np.asarray(scale)[:, None])
    expected_rows = np.clip(expected_rows, -128, 127) * np.asarray(scale)[:, None]
    expected = tiling.rows_to_tiles(jnp.asarray(expected_rows), (4, 8), (2, 4))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(expected), rtol=1e-6)


def test_quantize_int8_output_dtype():
    data = jnp.array([0.9, -0.9])
    q = affine.quantize_by_tile(data, 0.1, num_bits=8, output_dtype=jnp.int8)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [9, -9])


def test_quantize_rejects_insufficient_dtype():
    data = jnp.array([1.0])
    with pytest.raises(QuantizationError, match="not enough"):
        affine.quantize_by_tile(data, 0.1, num_bits=9, output_dtype=jnp.int8)


def test_quantize_under_jit():
    data = jnp.array(np.random.randn(8, 8).astype(np.float32))
    scale = jnp.full((8,), 0.05)

    def fn(d, s):
        q = affine.quantize_by_tile(d, s, tile_size=(1, 8), num_bits=4)
        return affine.dequantize_by_tile(q, s, tile_size=(1, 8))

    eager = fn(data, scale)
    jitted = jax.jit(fn)(data, scale)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-6)


# --- gradients ---------------------------------------------------------------


def _quant_dequant(data, scale, offset, num_bits=8, tile_size="data_shape"):
    q = affine.quantize_by_tile(data, scale, offset, tile_size=tile_size, num_bits=num_bits)
    return affine.dequantize_by_tile(q, scale, offset, tile_size=tile_size)


def test_data_gradient_clipped_ste():
    # GIVEN data with in-range and clipped values (scale=1, 4 bits: [-8, 7])
    data = jnp.array([0.3, 6.9, 100.0, -100.0, -7.9])

    def loss(d):
        return jnp.sum(_quant_dequant(d, jnp.array(1.0), None, num_bits=4))

    grad = jax.grad(loss)(data)
    # THEN gradient is 1 where in range, 0 where clipped
    np.testing.assert_array_equal(np.asarray(grad), [1.0, 1.0, 0.0, 0.0, 1.0])


def test_scale_gradient_lsq():
    # GIVEN scale 1.0, 8 bits, data containing an unclipped and a clipped value
    data = jnp.array([1.3, 200.0, -200.0])
    scale = jnp.array(1.0)

    def loss(s):
        return jnp.sum(_quant_dequant(data, s, None, num_bits=8))

    grad = float(jax.grad(loss)(scale))
    # THEN per the LSQ rule: unclipped -> (round(x/s) - x/s); clipped-> threshold
    expected = (round(1.3) - 1.3) + 127.0 + (-128.0)
    np.testing.assert_allclose(grad, expected, rtol=1e-5)


def test_offset_gradient():
    # GIVEN an asymmetric quantizer and data with a clipped element
    data = jnp.array([1.3, 300.0])
    scale = jnp.array(2.0)
    offset = jnp.array(1.0)

    def loss(o):
        return jnp.sum(_quant_dequant(data, scale, o, num_bits=8))

    grad = float(jax.grad(loss)(offset))
    # THEN: offset grad is scale for clipped elements, 0 for unclipped
    np.testing.assert_allclose(grad, 2.0, rtol=1e-6)


def test_per_tile_gradient_reduction():
    # GIVEN per-channel scales — grads must reduce per tile
    data = jnp.array([[0.3, 0.6], [100.0, -100.0]])
    scale = jnp.array([1.0, 1.0])

    def loss(s):
        return jnp.sum(_quant_dequant(data, s, None, num_bits=4, tile_size=(1, 2)))

    grad = np.asarray(jax.grad(loss)(scale))
    row0 = (0.0 - 0.3 + round(0.6) - 0.6)  # rounding errors, unclipped
    row1 = 7.0 + (-8.0)  # clip thresholds
    np.testing.assert_allclose(grad, [row0, row1], rtol=1e-5, atol=1e-6)


def test_dequantize_identity_backward():
    # GIVEN quantized data, dequantize alone has identity data-gradient
    q = jnp.array([1.0, 2.0, -3.0])
    scale = jnp.array(0.5)

    def loss(d):
        return jnp.sum(affine.dequantize_by_tile(d, scale) * jnp.array([1.0, 2.0, 3.0]))

    grad = np.asarray(jax.grad(loss)(q))
    np.testing.assert_array_equal(grad, [1.0, 2.0, 3.0])


# --- dynamic quantization ----------------------------------------------------


def test_dynamic_quantize_asymmetric():
    # GIVEN data in [-1, 2]
    data = jnp.array([[-1.0, 0.0, 1.0, 2.0]])
    q, scale, offset = affine.quantize_dynamic_by_tile(
        data, num_bits=8, symmetric=False, allow_one_sided=False
    )
    # THEN the full range maps into the grid and dequantization reconstructs
    dq = affine.dequantize_by_tile(q, scale, offset)
    atol = float(np.asarray(scale).squeeze()) / 2 + 1e-6
    np.testing.assert_allclose(np.asarray(dq), np.asarray(data), atol=atol)


def test_dynamic_quantize_per_tile():
    data = jnp.array(np.random.randn(4, 8).astype(np.float32))
    q, scale, offset = affine.quantize_dynamic_by_tile(
        data, tile_size=(1, 8), num_bits=8, symmetric=False
    )
    assert scale.shape == (4,)
    dq = affine.dequantize_by_tile(q, scale, offset, tile_size=(1, 8))
    err = np.abs(np.asarray(dq) - np.asarray(data))
    assert (err <= np.asarray(scale)[:, None] / 2 + 1e-6).all()


def test_dynamic_quantize_symmetric_no_offset_effect():
    data = jnp.array([[-2.0, 2.0]])
    q, scale, offset = affine.quantize_dynamic_by_tile(
        data, num_bits=8, symmetric=True, allow_one_sided=False
    )
    np.testing.assert_allclose(np.asarray(offset), 0.0)


def test_dynamic_quantize_empty_raises():
    with pytest.raises(QuantizationError, match="empty"):
        affine.quantize_dynamic_by_tile(jnp.zeros((0, 4)))


def test_dynamic_quantize_ste_gradient():
    data = jnp.array([0.5, 1.5, -0.5])

    def loss(d):
        q, s, o = affine.quantize_dynamic_by_tile(d, num_bits=8)
        return jnp.sum(q)

    grad = np.asarray(jax.grad(loss)(data))
    np.testing.assert_array_equal(grad, [1.0, 1.0, 1.0])


def test_dynamic_quantize_under_jit():
    data = jnp.array(np.random.randn(4, 4).astype(np.float32))

    @jax.jit
    def fn(d):
        q, s, o = affine.quantize_dynamic_by_tile(d, num_bits=8, symmetric=False)
        return affine.dequantize_by_tile(q, s, o)

    dq = fn(data)
    assert np.abs(np.asarray(dq) - np.asarray(data)).max() < 0.05
