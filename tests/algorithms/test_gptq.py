"""GPTQ tests. Modeled on reference `tests/quantization/test_gptq.py`:
GPTQ must beat plain round-to-nearest (RTN) on the calibration distribution.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.algorithms import (
    calculate_hessian,
    gptq,
    gptq_quantize,
    invert_hessian,
    layerwise_optimize,
)


def _rtn(w, num_bits, axis=1):
    # round-to-nearest per-channel symmetric baseline
    mx = np.abs(w).max(axis=0 if axis == 1 else 1, keepdims=True)
    scale = mx / (2 ** (num_bits - 1) - 1)
    return np.clip(np.round(w / scale), -(2 ** (num_bits - 1)), 2 ** (num_bits - 1) - 1) * scale


def test_hessian_shape_and_symmetry():
    x = jnp.asarray(np.random.RandomState(0).randn(64, 16).astype(np.float32))
    H = calculate_hessian(x)
    assert H.shape == (16, 16)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, rtol=1e-5)


def test_invert_hessian_is_upper_cholesky_of_inverse():
    rng = np.random.RandomState(1)
    A = rng.randn(8, 8).astype(np.float32)
    H = A @ A.T + 8 * np.eye(8, dtype=np.float32)
    U = np.asarray(invert_hessian(jnp.asarray(H), perc_damp=0.0))
    # U^T U ≈ H^-1
    np.testing.assert_allclose(U.T @ U, np.linalg.inv(H), rtol=2e-2, atol=1e-4)


@pytest.mark.parametrize("granularity", [ff.PerChannel(1), ff.PerTensor()])
def test_gptq_beats_rtn(granularity):
    # GIVEN correlated calibration inputs (the regime where GPTQ shines)
    rng = np.random.RandomState(0)
    n, k, m = 512, 64, 32
    base = rng.randn(n, 8).astype(np.float32)
    mix = rng.randn(8, k).astype(np.float32)
    x = base @ mix + 0.1 * rng.randn(n, k).astype(np.float32)
    w = rng.randn(k, m).astype(np.float32)

    q, w_dq, scales = gptq_quantize(
        jnp.asarray(w), jnp.asarray(x), num_bits=4, granularity=granularity,
        block_size=32,
    )
    # THEN output error on the calibration distribution beats RTN
    err_gptq = np.linalg.norm(x @ np.asarray(w_dq) - x @ w)
    err_rtn = np.linalg.norm(x @ _rtn(w, 4) - x @ w)
    assert err_gptq < err_rtn, (err_gptq, err_rtn)
    # grid values are within the 4-bit range
    assert np.asarray(q).max() <= 7 and np.asarray(q).min() >= -8


def test_gptq_act_order():
    rng = np.random.RandomState(2)
    x = rng.randn(256, 32).astype(np.float32) * np.linspace(0.1, 3, 32)
    w = rng.randn(32, 16).astype(np.float32)
    q, w_dq, _ = gptq_quantize(
        jnp.asarray(w), jnp.asarray(x), num_bits=4, block_size=16, act_order=True
    )
    err_gptq = np.linalg.norm(x @ np.asarray(w_dq) - x @ w)
    err_rtn = np.linalg.norm(x @ _rtn(w, 4) - x @ w)
    assert err_gptq < err_rtn


def test_gptq_module_updates_weights_and_quantizer():
    model = nnx.Linear(64, 32, rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    x = jnp.asarray(np.random.RandomState(0).randn(128, 64).astype(np.float32))
    w_before = np.asarray(model.kernel.value).copy()
    gptq(model, x, num_bits=4)
    assert not np.allclose(np.asarray(model.kernel.value), w_before)
    # weight quantizer installed with matching grid
    assert isinstance(model.weight_quantizer, ffnn.LinearQuantizer)
    assert model.weight_quantizer.num_bits == 4


def test_layerwise_optimize_sequential():
    class MLP(nnx.Module):
        def __init__(self, rngs):
            self.fc1 = nnx.Linear(32, 64, rngs=rngs)
            self.fc2 = nnx.Linear(64, 16, rngs=rngs)

        def __call__(self, x):
            h = self.fc1(x)
            h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
            return self.fc2(h)

    model = MLP(nnx.Rngs(0))
    ffnn.quantize_model(model)
    batches = [
        jnp.asarray(np.random.RandomState(i).randn(16, 32).astype(np.float32))
        for i in range(3)
    ]
    optimized = layerwise_optimize(model, batches, gptq, num_bits=4, sequential=True)
    assert optimized == ["fc1", "fc2"]
    assert isinstance(model.fc1.weight_quantizer, ffnn.LinearQuantizer)
