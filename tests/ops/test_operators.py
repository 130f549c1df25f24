"""Operator layer tests.

Modeled on reference `tests/nn/test_fallback.py` (strict guards, fallback
behavior) and `tests/nn/functional/test_add.py` / `test_like_ops.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastforward_tpu as ff
from fastforward_tpu import ops


def _q(x, scale=0.01, **kw):
    return ff.quantize_per_tensor(jnp.asarray(x), scale=scale, **kw)


def _oq(scale=0.02):
    """A simple output quantizer callable."""
    return lambda x: ff.quantize_per_tensor(x, scale=scale)


def test_linear_fallback_requires_output_quantizer_when_strict():
    x, w = _q(np.random.randn(2, 4)), _q(np.random.randn(4, 3))
    with pytest.raises(ff.QuantizationError, match="output quantizer"):
        ops.linear(x, w)


def test_linear_fallback_requires_quantized_inputs_when_strict():
    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    w = _q(np.random.randn(4, 3))
    with pytest.raises(ff.QuantizationError, match="must be quantized"):
        ops.linear(x, w, output_quantizer=_oq())


def test_linear_fallback_computes_dequantized_matmul():
    xn = np.random.randn(2, 4).astype(np.float32)
    wn = np.random.randn(4, 3).astype(np.float32)
    x, w = _q(xn), _q(wn)
    out = ops.linear(x, w, output_quantizer=_oq(0.05))
    assert isinstance(out, ff.QuantizedArray)
    expected = np.asarray(x.dequantize()) @ np.asarray(w.dequantize())
    np.testing.assert_allclose(np.asarray(out.dequantize()), expected, atol=0.026)


def test_nonstrict_allows_plain_arrays():
    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    w = jnp.asarray(np.random.randn(4, 3), dtype=jnp.float32)
    with ff.strict_quantization(False):
        out = ops.linear(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ np.asarray(w), rtol=1e-5)


def test_strict_override_kwarg():
    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    w = jnp.asarray(np.random.randn(4, 3), dtype=jnp.float32)
    out = ops.linear(x, w, strict_quantization=False)
    assert out.shape == (2, 3)


def test_add_quantized_and_scalar():
    x = _q([1.0, 2.0], scale=0.02)
    with ff.strict_quantization(False):
        out = ops.add(x, 1.0)
    np.testing.assert_allclose(np.asarray(out), [2.0, 3.0], atol=0.02)


def test_reshape_preserves_grid_per_tensor():
    # GIVEN a per-tensor quantized array
    x = _q(np.random.randn(2, 6))
    # WHEN reshaping (dispatcher kernel, no dequantization)
    out = ops.reshape(x, (3, 4))
    # THEN the result is still quantized with the same grid
    assert isinstance(out, ff.QuantizedArray)
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(
        np.asarray(out.raw_data), np.asarray(x.raw_data).reshape(3, 4)
    )


def test_scalar_mul_rescales_grid():
    x = _q([1.0, -2.0], scale=0.5)
    out = ops.mul(x, 3.0)
    assert isinstance(out, ff.QuantizedArray)
    # Grid values unchanged, scale tripled
    np.testing.assert_array_equal(np.asarray(out.raw_data), np.asarray(x.raw_data))
    np.testing.assert_allclose(np.asarray(out.dequantize()), [3.0, -6.0])


def test_scalar_mul_negative():
    x = _q([1.0, -2.0], scale=0.5)
    out = ops.mul(x, -2.0)
    np.testing.assert_allclose(np.asarray(out.dequantize()), [-2.0, 4.0])


def test_cat_same_grid_stays_quantized():
    ctx_scale = 0.25
    a = _q([1.0, 2.0], scale=ctx_scale)
    b = _q([3.0, 4.0], scale=ctx_scale)
    out = ops.cat([a, b])
    assert isinstance(out, ff.QuantizedArray)
    np.testing.assert_allclose(np.asarray(out.dequantize()), [1.0, 2.0, 3.0, 4.0])


def test_cat_mismatched_grid_falls_back():
    a = _q([1.0, 2.0], scale=0.25)
    b = _q([3.0, 4.0], scale=0.5)
    out = ops.cat([a, b], output_quantizer=_oq(0.25))
    assert isinstance(out, ff.QuantizedArray)
    np.testing.assert_allclose(np.asarray(out.dequantize()), [1.0, 2.0, 3.0, 4.0])


def test_operator_table_contains_core_ops():
    for name in ["linear", "conv2d", "softmax", "matmul", "add", "silu",
                 "layer_norm", "embedding", "scaled_dot_product_attention"]:
        assert ops.get_operator(name) is not None, name


def test_operator_alias_resolution():
    assert ops.get_operator("jax.nn.softmax").name == "softmax"


def test_ops_inside_jit():
    @jax.jit
    def f(x, w):
        xq = ff.quantize_per_tensor(x, 0.03)
        wq = ff.quantize_per_tensor(w, 0.03)
        return ops.linear(xq, wq, output_quantizer=_oq(0.06)).dequantize()

    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    w = jnp.asarray(np.random.randn(4, 3), dtype=jnp.float32)
    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), atol=0.25)


def test_dunder_ops_route_through_dispatcher():
    x = _q([1.0, 2.0], scale=0.5)
    out = x * 2.0  # scalar mul kernel — stays quantized
    assert isinstance(out, ff.QuantizedArray)
    with pytest.raises(ff.QuantizationError):
        _ = x + x  # strict: no output quantizer


def test_conv2d_matches_dense():
    x = np.random.randn(1, 8, 8, 3).astype(np.float32)
    k = np.random.randn(3, 3, 3, 4).astype(np.float32)
    with ff.strict_quantization(False):
        out = ops.conv2d(jnp.asarray(x), jnp.asarray(k), stride=1, padding=1)
    assert out.shape == (1, 8, 8, 4)


def test_layer_norm():
    x = np.random.randn(2, 5).astype(np.float32)
    with ff.strict_quantization(False):
        out = ops.layer_norm(jnp.asarray(x), (5,))
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)


def test_embedding_quantized_weight():
    w = _q(np.random.randn(10, 4))
    idx = jnp.array([1, 3])
    out = ops.embedding(idx, w, output_quantizer=_oq())
    assert isinstance(out, ff.QuantizedArray)
    assert out.shape == (2, 4)


def test_dispatcher_routes_int8_weight_to_w8a8_kernel():
    """An int8-stored per-channel QuantizedArray weight reaching ops.linear
    dispatches to the fused W8A8 kernel path, not the dequant fallback."""
    import fastforward_tpu.kernels  # registers dispatch kernels

    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    scale = np.abs(w).max(axis=0) / 127.0
    wq = ff.quantize_per_channel(
        jnp.asarray(w), 1, jnp.asarray(scale), num_bits=8,
        quantized_dtype=jnp.int8,
    )
    assert wq.raw_data.dtype == jnp.int8
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    out = ops.linear(x, wq, strict_quantization=False)
    expected = np.asarray(x) @ (np.asarray(wq.dequantize()))
    rel = np.abs(np.asarray(out, np.float32) - expected).max() / np.abs(expected).max()
    assert rel < 0.03
