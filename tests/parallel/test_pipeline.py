"""Pipeline parallelism: fill-drain schedule correctness on a CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.parallel import make_mesh, pipeline_forward

pytestmark = pytest.mark.multi_device


def _layer_fn(layer, h):
    w, b = layer
    return jnp.tanh(h @ w + b)


def _make_layers(key, L, H):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (L, H, H), jnp.float32) / np.sqrt(H)
    b = jax.random.normal(k2, (L, H), jnp.float32) * 0.1
    return (w, b)


def _sequential(layers, x):
    def body(h, layer):
        return _layer_fn(layer, h), None

    h, _ = jax.lax.scan(body, x, layers)
    return h


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_sequential(stages, microbatches):
    # GIVEN stacked layers and a batch
    if jax.device_count() < stages:
        pytest.skip("needs more devices")
    L, H, B = stages * 2, 16, 16
    layers = _make_layers(jax.random.PRNGKey(0), L, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H), jnp.float32)
    mesh = make_mesh({"stage": stages}, devices=jax.devices()[:stages])
    # WHEN running the pipeline schedule
    out = pipeline_forward(
        mesh, layers, x, _layer_fn, axis_name="stage",
        n_microbatches=microbatches,
    )
    # THEN it equals the sequential forward
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pipeline_single_stage_degenerates():
    # GIVEN a 1-stage mesh # WHEN running # THEN plain forward comes back
    L, H, B = 2, 8, 4
    layers = _make_layers(jax.random.PRNGKey(2), L, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H), jnp.float32)
    mesh = make_mesh({"stage": 1}, devices=jax.devices()[:1])
    out = pipeline_forward(mesh, layers, x, _layer_fn, n_microbatches=2)
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pipeline_validates_divisibility():
    L, H, B = 4, 8, 5
    layers = _make_layers(jax.random.PRNGKey(4), L, H)
    x = jnp.zeros((B, H), jnp.float32)
    mesh = make_mesh({"stage": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError):
        pipeline_forward(mesh, layers, x, _layer_fn, n_microbatches=2)
    with pytest.raises(ValueError):
        pipeline_forward(
            mesh, ( layers[0][:3], layers[1][:3] ), x[:4], _layer_fn, n_microbatches=2
        )


def test_pipeline_quantized_serving_layers():
    # GIVEN depth-stacked frozen QuantLinear MLP layers (W4A8 two-level)
    from fastforward_tpu.serving.engine import QuantLinear, quantize_linear

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    L, H, B = 4, 256, 8
    rng = np.random.RandomState(0)
    ws = [rng.randn(H, H).astype(np.float32) / np.sqrt(H) for _ in range(L)]
    qls = [quantize_linear(jnp.asarray(w), "w4a8_2l", group_size=128) for w in ws]
    stacked = QuantLinear(
        data=jnp.stack([q.data for q in qls]),
        scale=jnp.stack([q.scale for q in qls]),
        mode="w4a8_2l", group_size=128,
        mult=jnp.stack([q.mult for q in qls]),
        paired=qls[0].paired,
    )
    x = jnp.asarray(rng.randn(B, H).astype(np.float32))

    def layer_fn(ql, h):
        return ql(h, out_dtype=jnp.float32)

    mesh = make_mesh({"stage": 2}, devices=jax.devices()[:2])
    # WHEN pipelining over 2 stages
    out = pipeline_forward(mesh, stacked, x, layer_fn, n_microbatches=4)
    # THEN it matches the sequential quantized forward
    ref = x
    for q in qls:
        ref = q(ref, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
