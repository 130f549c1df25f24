"""Serving engine tests: frozen quantized weights vs the NNX model, decode
loop consistency, INT8 KV correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from fastforward_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from fastforward_tpu.serving import KVCache
from fastforward_tpu.serving.engine import (
    freeze_llama,
    make_decode_loop,
    quantize_linear,
    random_serving_params,
    serving_forward,
)


def test_quantize_linear_roundtrip_w8():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    ql = quantize_linear(jnp.asarray(w), "w8a8")
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32) * 0.5)
    out = np.asarray(ql(x, out_dtype=jnp.float32))
    expected = np.asarray(x) @ w
    assert np.abs(out - expected).max() / np.abs(expected).max() < 0.05


@pytest.mark.parametrize("mode", ["w4a8", "w4a16"])
def test_quantize_linear_roundtrip_w4(mode):
    rng = np.random.RandomState(1)
    w = rng.randn(256, 32).astype(np.float32) * 0.1
    ql = quantize_linear(jnp.asarray(w), mode)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32) * 0.5)
    out = np.asarray(ql(x, out_dtype=jnp.float32), dtype=np.float32)
    expected = np.asarray(x) @ w
    assert np.abs(out - expected).max() / np.abs(expected).max() < 0.15


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.tiny()
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    return config, model


def _cache(config, batch, max_len=32, quantized=True):
    return KVCache.create(
        num_layers=config.num_layers, batch_size=batch, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        dtype=jnp.float32, quantized=quantized,
    )


def test_frozen_forward_close_to_model(tiny):
    config, model = tiny
    params = freeze_llama(model, mode="w8a8")
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 8)))
    fp_logits, _ = model(ids)
    q_logits, _ = serving_forward(params, config, ids)
    # int8 weights + dynamic int8 activations: logits track the fp model
    fp, q = np.asarray(fp_logits), np.asarray(q_logits)
    denom = np.abs(fp).max()
    assert np.abs(fp - q).max() / denom < 0.12
    # top-1 predictions mostly agree
    agree = (fp.argmax(-1) == q.argmax(-1)).mean()
    assert agree > 0.7


def test_decode_matches_prefill(tiny):
    config, _ = tiny
    params = random_serving_params(config, mode="w4a8", seed=3)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (2, 6)))
    full_logits, _ = serving_forward(params, config, ids)

    cache = _cache(config, 2, quantized=False)
    _, cache = serving_forward(params, config, ids[:, :4], cache=cache)
    step_logits, cache = serving_forward(params, config, ids[:, 4:5], cache=cache)
    # bf16 accumulation order differs between the padded-cache attention and
    # the dense-causal attention; allow small absolute noise.
    np.testing.assert_allclose(
        np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, 4]),
        atol=0.12,
    )


def test_int8_kv_cache_decode(tiny):
    config, _ = tiny
    params = random_serving_params(config, mode="w4a16", seed=3)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, 8)))
    fp_cache = _cache(config, 1, quantized=False)
    q_cache = _cache(config, 1, quantized=True)
    fp_logits, _ = serving_forward(params, config, ids, cache=fp_cache)
    q_logits, _ = serving_forward(params, config, ids, cache=q_cache)
    fp, q = np.asarray(fp_logits), np.asarray(q_logits)
    assert np.abs(fp - q).max() / np.abs(fp).max() < 0.08


def test_decode_loop_jit(tiny):
    config, _ = tiny
    params = random_serving_params(config, mode="w8a8", seed=5)
    cache = _cache(config, 2, max_len=64, quantized=True)
    prompt = jnp.asarray(np.random.RandomState(2).randint(0, 256, (2, 8)))
    logits, cache = jax.jit(
        lambda p, c, ids: serving_forward(p, config, ids, cache=c)
    )(params, cache, prompt)
    first = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(prompt.dtype)

    loop = make_decode_loop(config, num_steps=8)
    tokens, cache = loop(params, cache, first)
    assert tokens.shape == (2, 8)
    assert int(cache.length) == 8 + 8


def test_logits_positions_slicing():
    # "last" and per-row gathers must equal the corresponding slices of the
    # full logits — the (B, T, vocab) tensor just never materializes.
    import jax.numpy as jnp
    import numpy as np

    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.engine import (
        random_serving_params,
        serving_forward,
    )

    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_seq_len=32,
        dtype=jnp.float32,
    )
    params = random_serving_params(config, mode="w8a8", seed=0)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (3, 8)))

    full, _ = serving_forward(params, config, ids)
    last, _ = serving_forward(params, config, ids, logits_positions="last")
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), np.asarray(full[:, -1]), rtol=1e-5, atol=1e-5
    )
    rows = jnp.asarray([1, 4, 7])
    picked, _ = serving_forward(params, config, ids, logits_positions=rows)
    np.testing.assert_allclose(
        np.asarray(picked[:, 0]),
        np.asarray(full[np.arange(3), np.asarray(rows)]),
        rtol=1e-5, atol=1e-5,
    )
