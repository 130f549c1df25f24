"""Flash prefill attention: CPU oracle tests.

`flash_prefill` falls back to `flash_prefill_reference` off-TPU; these tests
pin the oracle against an independent dense formulation (the engine's
einsum+additive-mask path) and the dispatch behavior. The Pallas kernel
itself is checked on real TPU by `scripts/tpu_probe_prefill.py` (same
oracle) and the TTFT A/B in `scripts/ttft.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.kernels.attention import (
    NEG_INF,
    flash_prefill,
    flash_prefill_reference,
)


def _dense_engine_attention(q, kf, vf, starts):
    """The engine's dense formulation: GQA repeat + einsum + additive mask."""
    B, H, T, d = q.shape
    Hkv, S = kf.shape[1], kf.shape[2]
    groups = H // Hkv
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)
    pos = starts[:, None] + jnp.arange(T)[None, :]
    mask = jnp.where(
        jnp.arange(S)[None, None, None, :] <= pos[:, None, :, None], 0.0, NEG_INF
    )
    scores = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                        kf.astype(jnp.float32)) / np.sqrt(d)
    weights = jax.nn.softmax(scores + mask, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", weights, vf.astype(jnp.float32))


@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("start", [0, 5])
def test_prefill_reference_matches_dense_bf16(groups, start):
    rng = np.random.RandomState(0)
    B, Hkv, T, S, d = 2, 2, 8, 16, 32
    H = Hkv * groups
    q = jnp.asarray(rng.randn(B, H, T, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32))
    starts = jnp.full((B,), start, jnp.int32)

    out = flash_prefill_reference(q, k, None, v, None, starts)
    ref = _dense_engine_attention(q, k, v, starts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_prefill_reference_int8_kv():
    rng = np.random.RandomState(1)
    B, Hkv, H, T, S, d = 2, 2, 8, 8, 16, 32
    q = jnp.asarray(rng.randn(B, H, T, d).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.1 + 0.01)
    vs = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.1 + 0.01)
    starts = jnp.zeros((B,), jnp.int32)

    out = flash_prefill_reference(q, k8, ks, v8, vs, starts)
    kf = k8.astype(jnp.float32) * ks[..., None]
    vf = v8.astype(jnp.float32) * vs[..., None]
    ref = _dense_engine_attention(q, kf, vf, starts)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_prefill_causality():
    # Changing K/V at positions beyond the causal frontier must not change
    # the output for earlier rows.
    rng = np.random.RandomState(2)
    B, Hkv, H, T, S, d = 1, 1, 2, 4, 8, 16
    q = jnp.asarray(rng.randn(B, H, T, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32))
    starts = jnp.zeros((B,), jnp.int32)
    out = flash_prefill_reference(q, k, None, v, None, starts)

    k2 = k.at[:, :, T:].set(99.0)  # rows no q position may attend to
    v2 = v.at[:, :, T:].set(-99.0)
    out2 = flash_prefill_reference(q, k2, None, v2, None, starts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_prefill_entry_point_dispatches_to_reference_on_cpu():
    rng = np.random.RandomState(3)
    B, Hkv, H, T, S, d = 2, 2, 8, 8, 16, 128
    q = jnp.asarray(rng.randn(B, H, T, d).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.1)
    starts = jnp.asarray([0, 3], jnp.int32)

    out = flash_prefill(q, k8, ks, v8, vs, starts)
    ref = flash_prefill_reference(q, k8, ks, v8, vs, starts)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stacked_prefill_unchanged_by_flash_knob(monkeypatch):
    # On CPU the serving prefill must produce identical results whether the
    # flash-prefill knob is on or off (both route to dense/reference math).
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        random_stacked_params,
        serving_forward_stacked,
    )

    config = LlamaConfig.tiny()
    params, stacked = random_stacked_params(config, mode="w8a8", seed=0)
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=32,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    ids = jnp.asarray(np.random.RandomState(0).randint(0, config.vocab_size, (2, 8)))
    logits_on, _ = serving_forward_stacked(params, stacked, config, ids, cache)
    monkeypatch.setenv("FF_FLASH_PREFILL", "0")
    logits_off, _ = serving_forward_stacked(params, stacked, config, ids, cache)
    np.testing.assert_array_equal(np.asarray(logits_on), np.asarray(logits_off))
