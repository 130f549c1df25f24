"""Ring-attention context parallelism tests (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.parallel import make_mesh
from fastforward_tpu.parallel.context import context_parallel_attention

pytestmark = pytest.mark.multi_device


def _reference_attention(q, k, v, causal=True):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    if causal:
        T, S = scores.shape[-2:]
        mask = jnp.arange(S)[None, :] <= jnp.arange(T)[:, None]
        scores = jnp.where(mask[None, None], scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("sp", [4, 8])
def test_ring_attention_matches_reference(causal, sp):
    mesh = make_mesh({"sp": sp}, devices=jax.devices()[:sp])
    rng = np.random.RandomState(0)
    B, H, T, D = 2, 4, 64, 16
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)

    out = context_parallel_attention(mesh, q, k, v, axis_name="sp", causal=causal)
    ref = _reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_jits_under_mesh():
    mesh = make_mesh({"sp": 8})
    rng = np.random.RandomState(1)
    B, H, T, D = 1, 2, 32, 8
    args = [jnp.asarray(rng.randn(B, H, T, D), jnp.float32) for _ in range(3)]
    fn = jax.jit(
        lambda q, k, v: context_parallel_attention(mesh, q, k, v)
    )
    out = fn(*args)
    assert out.shape == (B, H, T, D)
    # second call hits the compiled cache; same values
    np.testing.assert_allclose(np.asarray(fn(*args)), np.asarray(out))
