"""Sampling: greedy/top-k/top-p invariants + sampled decode loop."""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.serving.sampling import (
    SamplingParams,
    _apply_top_k,
    _apply_top_p,
    sample_logits,
)


def test_greedy_matches_argmax():
    # GIVEN arbitrary logits # WHEN temperature is 0 # THEN argmax
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 32), jnp.float32)
    out = sample_logits(logits, SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits).argmax(-1))


def test_top_k_masks_tail():
    # GIVEN logits # WHEN top-k filtering # THEN exactly k survive per row
    logits = jnp.asarray(np.random.RandomState(1).randn(3, 64), jnp.float32)
    masked = _apply_top_k(logits, 5)
    alive = (np.asarray(masked) > -1e29).sum(-1)
    np.testing.assert_array_equal(alive, [5, 5, 5])


def test_top_k_one_is_greedy():
    # GIVEN peaky logits # WHEN top_k=1 sampling # THEN always the argmax
    logits = jnp.asarray(np.random.RandomState(2).randn(8, 16), jnp.float32)
    out = sample_logits(
        logits, SamplingParams(temperature=1.0, top_k=1), jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits).argmax(-1))


def test_top_p_keeps_nucleus():
    # GIVEN a known distribution: probs 0.5, 0.3, 0.15, 0.05
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # WHEN top_p=0.7 # THEN tokens 0 and 1 survive (cum 0.5, 0.8)
    masked = _apply_top_p(logits, 0.7)
    alive = np.asarray(masked[0]) > -1e29
    np.testing.assert_array_equal(alive, [True, True, False, False])
    # AND top_p=0.95 keeps three
    masked = _apply_top_p(logits, 0.95)
    alive = np.asarray(masked[0]) > -1e29
    np.testing.assert_array_equal(alive, [True, True, True, False])


def test_sampled_tokens_respect_support():
    # GIVEN logits where only 2 tokens have non-negligible mass
    base = jnp.full((2, 32), -20.0)
    logits = base.at[:, 3].set(5.0).at[:, 7].set(5.0)
    params = SamplingParams(temperature=1.0, top_k=0, top_p=1.0)
    # WHEN sampling many times # THEN only those tokens appear
    keys = jax.random.split(jax.random.PRNGKey(3), 64)
    toks = jax.vmap(lambda k: sample_logits(logits, params, k))(keys)
    assert set(np.asarray(toks).ravel().tolist()) <= {3, 7}


def test_sampled_decode_loop_runs():
    # GIVEN a tiny stacked model # WHEN decoding with temperature 0.8/top-k 8
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        make_stacked_decode_loop,
        random_stacked_params,
    )

    config = LlamaConfig.tiny()
    params, stacked = random_stacked_params(config, mode="w4a8", seed=0)
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=16,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    loop = make_stacked_decode_loop(
        config, num_steps=4,
        sampling=__import__(
            "fastforward_tpu.serving.sampling", fromlist=["SamplingParams"]
        ).SamplingParams(temperature=0.8, top_k=8),
    )
    tok = jnp.asarray([[1], [2]])
    tokens, cache2 = loop(params, stacked, cache, tok, jax.random.PRNGKey(0))
    # THEN 4 tokens per sequence, cache advanced 4 steps
    assert tokens.shape == (2, 4)
    assert int(cache2.length) == 4
    assert (np.asarray(tokens) >= 0).all()
