"""Quantized SDPA tests. Modeled on reference
`tests/nn/functional_custom/test_sdpa_math.py` (math vs dense reference)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import fastforward_tpu as ff
from fastforward_tpu import ops


def _dense_sdpa(q, k, v, mask=None, is_causal=False):
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = (q @ np.swapaxes(k, -1, -2)) * scale
    if is_causal:
        ql, kl = scores.shape[-2], scores.shape[-1]
        causal = np.tril(np.ones((ql, kl), dtype=bool), kl - ql)
        scores = np.where(causal, scores, -np.inf)
    if mask is not None:
        scores = scores + mask
    weights = np.exp(scores - scores.max(-1, keepdims=True))
    weights = weights / weights.sum(-1, keepdims=True)
    return weights @ v


@pytest.fixture
def qkv():
    rng = np.random.RandomState(7)
    shape = (2, 4, 8, 16)  # batch, heads, seq, dim
    return tuple(rng.randn(*shape).astype(np.float32) for _ in range(3))


def test_sdpa_matches_dense(qkv):
    q, k, v = qkv
    with ff.strict_quantization(False):
        out = ops.scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), _dense_sdpa(q, k, v), rtol=1e-4, atol=1e-5)


def test_sdpa_causal(qkv):
    q, k, v = qkv
    with ff.strict_quantization(False):
        out = ops.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True
        )
    np.testing.assert_allclose(
        np.asarray(out), _dense_sdpa(q, k, v, is_causal=True), rtol=1e-4, atol=1e-5
    )


def test_sdpa_additive_mask(qkv):
    q, k, v = qkv
    mask = np.zeros((8, 8), dtype=np.float32)
    mask[:, 4:] = -np.inf
    with ff.strict_quantization(False):
        out = ops.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), attn_mask=jnp.asarray(mask)
        )
    np.testing.assert_allclose(np.asarray(out), _dense_sdpa(q, k, v, mask), rtol=1e-4, atol=1e-5)


def test_sdpa_quantized_inputs_strict(qkv):
    q, k, v = qkv
    qq = ff.quantize_per_tensor(jnp.asarray(q), 0.04)
    kq = ff.quantize_per_tensor(jnp.asarray(k), 0.04)
    vq = ff.quantize_per_tensor(jnp.asarray(v), 0.04)
    out = ops.scaled_dot_product_attention(
        qq, kq, vq, output_quantizer=lambda x: ff.quantize_per_tensor(x, 0.04)
    )
    assert isinstance(out, ff.QuantizedArray)
    np.testing.assert_allclose(
        np.asarray(out.dequantize()), _dense_sdpa(q, k, v), atol=0.3
    )


def test_sdpa_intermediate_quantizers(qkv):
    q, k, v = qkv
    calls = []

    def spy(name):
        def fn(x):
            calls.append(name)
            return x

        return fn

    with ff.strict_quantization(False):
        ops.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scaled_query_quantizer=spy("sq"),
            scaled_key_quantizer=spy("sk"),
            attn_scores_quantizer=spy("scores"),
            attn_weights_quantizer=spy("weights"),
        )
    assert calls == ["sq", "sk", "scores", "weights"]


def test_sdpa_upcast_context(qkv):
    q, k, v = qkv
    with ff.strict_quantization(False), ops.sdpa_upcast(False):
        out = ops.scaled_dot_product_attention(
            jnp.asarray(q, dtype=jnp.bfloat16),
            jnp.asarray(k, dtype=jnp.bfloat16),
            jnp.asarray(v, dtype=jnp.bfloat16),
        )
    assert out.dtype == jnp.bfloat16
