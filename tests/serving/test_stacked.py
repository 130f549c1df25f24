"""Stacked (lax.scan over layers) forward must match the unrolled engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving import KVCache
from fastforward_tpu.serving.engine import random_serving_params, serving_forward
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    make_stacked_decode_loop,
    serving_forward_stacked,
    stack_serving_layers,
)


@pytest.fixture(scope="module")
def setup():
    config = LlamaConfig.tiny()
    params = random_serving_params(config, mode="w4a8", seed=0)
    stacked = stack_serving_layers(params)
    return config, params, stacked


def test_stacked_matches_unrolled_no_cache(setup):
    config, params, stacked = setup
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 8)))
    ref, _ = serving_forward(params, config, ids)
    out, _ = serving_forward_stacked(params, stacked, config, ids)
    # bf16 activations: scan-vs-unrolled changes fusion/rounding slightly
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)
    agree = (np.asarray(out).argmax(-1) == np.asarray(ref).argmax(-1)).mean()
    assert agree > 0.9


def test_stacked_matches_unrolled_with_cache(setup):
    config, params, stacked = setup
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (2, 6)))
    cache_u = KVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=16,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim, quantized=True,
    )
    cache_s = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=16,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim, quantized=True,
    )
    ref, cache_u = serving_forward(params, config, ids, cache=cache_u)
    out, cache_s = serving_forward_stacked(params, stacked, config, ids, cache=cache_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.25)
    assert int(cache_s.length) == 6
    # caches hold the same content (layer 0)
    np.testing.assert_allclose(
        np.asarray(cache_s.k[0]), np.asarray(cache_u.layer(0).k), atol=1
    )


def test_stacked_decode_loop(setup):
    config, params, stacked = setup
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=32,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim, quantized=True,
    )
    prompt = jnp.asarray(np.random.RandomState(2).randint(0, 256, (2, 4)))
    logits, cache = jax.jit(
        lambda p, s, c, i: serving_forward_stacked(p, s, config, i, cache=c)
    )(params, stacked, cache, prompt)
    tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(prompt.dtype)
    loop = make_stacked_decode_loop(config, num_steps=6)
    tokens, cache = loop(params, stacked, cache, tok)
    assert tokens.shape == (2, 6)
    assert int(cache.length) == 4 + 6


def test_stacked_kv_carry_path_matches_slab_path(setup, monkeypatch):
    # GIVEN a decode step (T=1) on a quantized cache
    config, params, stacked = setup
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=16,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, (2, 4)))
    _, cache = serving_forward_stacked(params, stacked, config, ids, cache=cache)
    tok = jnp.asarray([[7], [9]])
    # WHEN running the decode step through the slab flow and the stacked-KV
    # carry flow (forced on CPU; kernels use their reference oracles)
    monkeypatch.setenv("FF_KV_STACKED", "0")
    ref_logits, ref_cache = serving_forward_stacked(
        params, stacked, config, tok, cache=cache
    )
    monkeypatch.setenv("FF_KV_STACKED", "force")
    out_logits, out_cache = serving_forward_stacked(
        params, stacked, config, tok, cache=cache
    )
    # THEN logits agree to activation-noise tolerance; layer-0 cache content
    # is identical (identical inputs), later layers may differ by one int8
    # step (the two attention formulations round bf16 differently and the
    # difference propagates into the next layer's K/V quantization)
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), atol=0.25
    )
    np.testing.assert_array_equal(
        np.asarray(out_cache.k[0]), np.asarray(ref_cache.k[0])
    )
    for a, sa, b, sb in (
        (out_cache.k, out_cache.k_scale, ref_cache.k, ref_cache.k_scale),
        (out_cache.v, out_cache.v_scale, ref_cache.v, ref_cache.v_scale),
    ):
        deq_a = np.asarray(a, np.float32) * np.asarray(sa)[..., None]
        deq_b = np.asarray(b, np.float32) * np.asarray(sb)[..., None]
        scale = max(np.abs(deq_b).max(), 1e-6)
        np.testing.assert_allclose(deq_a, deq_b, atol=0.05 * scale)
    assert int(out_cache.length) == int(ref_cache.length)


def test_greedy_loop_fused_argmax_matches_logits_argmax(monkeypatch):
    # GIVEN a tiny two-level W4A8 model (the fused GEMV+argmax head's mode)
    config = LlamaConfig.tiny()
    from fastforward_tpu.serving.stacked import random_stacked_params

    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)

    def run(fused):
        monkeypatch.setenv("FF_FUSED_ARGMAX", "1" if fused else "0")
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=2, max_len=32,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        tok = jnp.asarray([[3], [200]], jnp.int32)
        loop = make_stacked_decode_loop(config, num_steps=6, donate=False)
        tokens, _ = loop(params, stacked, cache, tok)
        return np.asarray(tokens)

    # WHEN decoding greedily with the fused head on and off
    # THEN the token streams are identical (bit-identical argmax contract)
    np.testing.assert_array_equal(run(True), run(False))
