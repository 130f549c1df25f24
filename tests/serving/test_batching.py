"""Continuous batching tests: correctness vs single-request decode, slot
reuse, staggered admission."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.batching import ContinuousBatchingEngine
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    make_stacked_decode_loop,
    random_stacked_params,
    serving_forward_stacked,
)


@pytest.fixture(scope="module")
def setup():
    config = LlamaConfig.tiny()
    params, stacked = random_stacked_params(config, mode="w8a8", seed=0)
    return config, params, stacked


def _reference_generate(config, params, stacked, prompt, steps):
    """Single-request greedy generation via the plain decode loop."""
    import jax

    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=1, max_len=64,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim, quantized=True,
    )
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    logits, cache = jax.jit(
        lambda p, s, c, i: serving_forward_stacked(p, s, config, i, cache=c)
    )(params, stacked, cache, ids)
    first = int(np.asarray(jnp.argmax(logits[:, -1], axis=-1))[0])
    loop = make_stacked_decode_loop(config, num_steps=steps - 1, donate=False)
    tokens, _ = loop(params, stacked, cache, jnp.asarray([[first]], jnp.int32))
    return [first] + np.asarray(tokens)[0].tolist()


def test_single_request_matches_plain_decode(setup):
    config, params, stacked = setup
    prompt = [5, 17, 3, 42]
    expected = _reference_generate(config, params, stacked, prompt, steps=6)

    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=4, max_len=64
    )
    rid = engine.submit(prompt, max_new_tokens=6)
    results = engine.run_until_complete()
    assert results[rid] == expected


def test_concurrent_requests_isolated(setup):
    """A request's output must not depend on its co-tenants: run the same
    prompt twice with different neighbors (same batch shape, so numerics are
    bit-identical) and require identical generations."""
    config, params, stacked = setup
    target = [1, 2, 3]

    def run_with(neighbors):
        engine = ContinuousBatchingEngine(
            config, params, stacked, max_batch=4, max_len=64
        )
        rid = engine.submit(target, max_new_tokens=5)
        for p in neighbors:
            engine.submit(p, max_new_tokens=5)
        return engine.run_until_complete()[rid]

    out_a = run_with([[9, 8, 7, 6], [100, 200]])
    out_b = run_with([[55, 44], [3, 3, 3, 3]])
    assert out_a == out_b
    assert len(out_a) == 5


def test_more_requests_than_slots(setup):
    config, params, stacked = setup
    engine = ContinuousBatchingEngine(config, params, stacked, max_batch=2, max_len=64)
    rids = [engine.submit([i + 1, i + 2], max_new_tokens=3) for i in range(5)]
    results = engine.run_until_complete()
    assert set(results) == set(rids)
    assert all(len(tokens) == 3 for tokens in results.values())


def test_staggered_admission(setup):
    config, params, stacked = setup
    prompt_a, prompt_b = [4, 5, 6], [7, 8]
    expected_b = _reference_generate(config, params, stacked, prompt_b, steps=4)

    engine = ContinuousBatchingEngine(config, params, stacked, max_batch=4, max_len=64)
    rid_a = engine.submit(prompt_a, max_new_tokens=8)
    engine.step()
    engine.step()  # a is mid-generation
    rid_b = engine.submit(prompt_b, max_new_tokens=4)
    results = engine.run_until_complete()
    # b's output is unaffected by a's occupancy of the batch
    assert results[rid_b] == expected_b
    assert len(results[rid_a]) == 8


def test_engine_with_stochastic_sampling():
    # GIVEN an engine configured with temperature/top-k sampling
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.sampling import SamplingParams
    from fastforward_tpu.serving.stacked import random_stacked_params

    config = LlamaConfig.tiny()
    params, stacked = random_stacked_params(config, mode="w4a8", seed=0)
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=32,
        sampling=SamplingParams(temperature=0.9, top_k=16), seed=7,
    )
    # WHEN running two requests # THEN both complete with the right lengths
    a = engine.submit([1, 2, 3], max_new_tokens=5)
    b = engine.submit([4, 5], max_new_tokens=3)
    out = engine.run_until_complete()
    assert len(out[a]) == 5 and len(out[b]) == 3
    assert all(0 <= t < config.vocab_size for t in out[a] + out[b])
