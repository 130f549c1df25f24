"""QuantizedArray tests. Modeled on reference `tests/test_quantized_tensor.py`
(dispatch/fallback parts live in tests/ops)."""

import jax
import jax.numpy as jnp
import numpy as np

import fastforward_tpu as ff


def test_quantize_attach_and_dequantize():
    data = jnp.array([[0.1, 0.52], [-0.9, 0.3]])
    qa = ff.quantize_per_tensor(data, scale=0.01, num_bits=8)
    assert isinstance(qa, ff.QuantizedArray)
    assert qa.shape == (2, 2)
    dq = qa.dequantize()
    np.testing.assert_allclose(np.asarray(dq), np.asarray(data), atol=0.006)


def test_raw_data_is_grid_values():
    data = jnp.array([0.5, -0.5])
    qa = ff.quantize_per_tensor(data, scale=0.1)
    np.testing.assert_array_equal(np.asarray(qa.raw_data), [5.0, -5.0])


def test_pytree_roundtrip():
    qa = ff.quantize_per_tensor(jnp.array([1.0, 2.0]), scale=0.5)
    leaves, treedef = jax.tree_util.tree_flatten(qa)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, ff.QuantizedArray)
    np.testing.assert_array_equal(
        np.asarray(rebuilt.dequantize()), np.asarray(qa.dequantize())
    )


def test_quantized_array_through_jit():
    # GIVEN a jitted function taking and returning QuantizedArray
    @jax.jit
    def double_dequant(qa: ff.QuantizedArray):
        return qa.dequantize() * 2

    qa = ff.quantize_per_tensor(jnp.array([1.0, 2.0]), scale=0.5)
    out = double_dequant(qa)
    np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])


def test_quantize_inside_jit():
    @jax.jit
    def quantize(x):
        qa = ff.quantize_per_tensor(x, scale=0.1, num_bits=8)
        return qa

    qa = quantize(jnp.array([0.3]))
    assert isinstance(qa, ff.QuantizedArray)
    np.testing.assert_array_equal(np.asarray(qa.raw_data), [3.0])


def test_per_channel_quantize():
    data = jnp.asarray(np.random.randn(4, 8).astype(np.float32))
    scale = jnp.full((4,), 0.05)
    qa = ff.quantize_per_channel(data, 0, scale)
    dq = qa.dequantize()
    assert np.abs(np.asarray(dq) - np.asarray(data)).max() <= 0.026


def test_dynamic_quantize_returns_static_context():
    data = jnp.asarray(np.random.randn(4, 4).astype(np.float32))
    qa = ff.quantize_dynamically(data, num_bits=8)
    # Dynamic quantization attaches *static* params (scale/offset inferred)
    assert isinstance(qa.quant_args(), ff.StaticAffineQuantParams)
    dq = qa.dequantize()
    assert np.abs(np.asarray(dq) - np.asarray(data)).max() < 0.05


def test_export_mode_returns_plain_array():
    data = jnp.array([0.3, 0.7])
    with ff.export_mode(True):
        out = ff.quantize_per_tensor(data, scale=0.1)
    assert not isinstance(out, ff.QuantizedArray)
    np.testing.assert_allclose(np.asarray(out), [0.3, 0.7], atol=0.06)


def test_int8_storage():
    data = jnp.array([1.0, -1.0])
    qa = ff.quantize_per_tensor(data, scale=0.25, quantized_dtype=jnp.int8)
    assert qa.raw_data.dtype == jnp.int8
    assert qa.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(qa.dequantize()), [1.0, -1.0])


def test_grad_through_quantized_array():
    # Quantize->dequantize inside jit with grad wrt data and scale
    def loss(x, s):
        qa = ff.quantize_per_tensor(x, scale=s, num_bits=8)
        return jnp.sum(qa.dequantize() ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.array([0.52]), jnp.array(0.1))
    # d/dx (dequant(x))^2 = 2*dequant ~= 2*0.5 via STE
    np.testing.assert_allclose(np.asarray(g[0]), [1.0], atol=1e-6)
