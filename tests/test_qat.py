"""Quantization-aware training: the LSQ/STE custom gradients must train both
model weights and quantizer scales with a real optimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn


class QatMLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(16, 32, rngs=rngs)
        self.fc2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = jax.nn.relu(h.dequantize() if isinstance(h, ff.QuantizedArray) else h)
        out = self.fc2(h)
        return out.dequantize() if isinstance(out, ff.QuantizedArray) else out


def _build():
    model = QatMLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    cfg = ff.QuantizationConfig()
    cfg.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                 num_bits=4, symmetric=True, allow_one_sided=False)
    cfg.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer, num_bits=8)
    cfg.initialize(model)
    for _, q in ffnn.named_quantizers(model):
        if isinstance(q, ffnn.LinearQuantizer):
            q.quantization_range = (-2.0, 2.0)
    return model


def test_qat_training_reduces_loss_and_trains_scales():
    model = _build()
    graphdef, state = nnx.split(model)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    w_true = rng.randn(16, 8).astype(np.float32)
    y = jnp.asarray(x @ w_true)

    opt = optax.adam(3e-3)
    opt_state = opt.init(state)

    @jax.jit
    def step(state, opt_state):
        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            with ff.flags.strict_quantization(False):
                pred = m(x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt_state = opt.update(grads, opt_state)
        state = jax.tree.map(lambda p, u: p + u, state, updates)
        return loss, state, opt_state

    losses = []
    scale_before = float(
        nnx.merge(graphdef, state).fc1.weight_quantizer.scale.value[0]
    )
    for _ in range(60):
        loss, state, opt_state = step(state, opt_state)
        losses.append(float(loss))

    trained = nnx.merge(graphdef, state)
    scale_after = float(trained.fc1.weight_quantizer.scale.value[0])

    # Loss strictly improves and the quantizer scale moved (LSQ gradient flows)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert scale_after != pytest.approx(scale_before)


def test_scale_gradient_is_finite_and_nonzero():
    model = _build()
    graphdef, state = nnx.split(model)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16).astype(np.float32))

    def loss_fn(state):
        m = nnx.merge(graphdef, state)
        with ff.flags.strict_quantization(False):
            return jnp.sum(m(x) ** 2)

    grads = jax.grad(loss_fn)(state)
    trained = nnx.merge(graphdef, grads)
    g = np.asarray(trained.fc1.weight_quantizer.scale.value)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
