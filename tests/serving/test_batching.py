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


def test_heterogeneous_per_request_sampling(setup):
    # Requests with different sampling configs share one engine: a greedy
    # request must still match the plain greedy decode exactly while a
    # stochastic request runs beside it.
    from fastforward_tpu.serving.sampling import SamplingParams

    config, params, stacked = setup
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=4, max_len=64,
        sampling=SamplingParams(temperature=0.0),
    )
    greedy_prompt = [5, 17, 3, 42]
    rid_greedy = engine.submit(greedy_prompt, max_new_tokens=6)
    rid_hot = engine.submit(
        [1, 2, 3], max_new_tokens=6,
        sampling=SamplingParams(temperature=1.2, top_k=20, top_p=0.9),
    )
    results = engine.run_until_complete()
    ref = _reference_generate(config, params, stacked, greedy_prompt, 6)
    assert results[rid_greedy] == ref
    assert len(results[rid_hot]) == 6
    assert all(0 <= t < config.vocab_size for t in results[rid_hot])


def test_batched_admission_deterministic_and_tracks_serial(setup):
    # A group of requests admitted in ONE bucketed batch prefill: the run is
    # deterministic (identical engines → identical outputs) and each
    # request's first sampled token matches serial admission. Full-sequence
    # bitwise equality across admission-batch shapes is NOT asserted — XLA's
    # f32 attention reductions are shape-dependent (different vectorization
    # for B=1 vs B=4), and greedy decode amplifies one flipped argmax on a
    # random tiny model's near-flat logits.
    config, params, stacked = setup
    prompts = [[5, 17, 3, 42], [7, 7], [9, 1, 2, 3, 4, 5, 6]]

    def batch_run():
        eng = ContinuousBatchingEngine(
            config, params, stacked, max_batch=4, max_len=64,
        )
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        return rids, eng.run_until_complete()

    rids, out_a = batch_run()
    rids_b, out_b = batch_run()
    assert [out_a[r] for r in rids] == [out_b[r] for r in rids_b]

    for p, rid in zip(prompts, rids):
        eng = ContinuousBatchingEngine(
            config, params, stacked, max_batch=4, max_len=64,
        )
        r = eng.submit(p, max_new_tokens=5)
        serial = eng.run_until_complete()[r]
        assert out_a[rid][0] == serial[0], (p, out_a[rid], serial)
        assert len(out_a[rid]) == len(serial) == 5


def test_prompt_length_bucketing_reuses_compilation(setup):
    # Prompts of different lengths land in the same power-of-two bucket →
    # the prefill compiles once per (bucket, admission-batch) shape.
    config, params, stacked = setup
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=64,
    )
    calls = []
    orig = engine._prefill_batch

    def counting(*args):
        calls.append(args[3].shape)  # ids shape
        return orig(*args)

    engine._prefill_batch = counting
    for p in ([1, 2, 3], [4, 5, 6, 7, 8], [9] * 11, [2] * 16):
        engine.submit(p, max_new_tokens=2)
    engine.run_until_complete()
    # all four prompts bucket to T=16; admission batches of 1 or 2
    assert all(s[1] == 16 for s in calls), calls


def test_burst_decode_matches_single_steps(setup):
    # step_burst(n) must produce the same greedy generations as n single
    # steps (one device program vs n host round-trips).
    config, params, stacked = setup
    prompts = [[5, 17, 3, 42], [7, 7]]

    eng_a = ContinuousBatchingEngine(config, params, stacked, max_batch=2,
                                     max_len=64)
    for p in prompts:
        eng_a.submit(p, max_new_tokens=6)
    out_a = eng_a.run_until_complete(burst=3)

    eng_b = ContinuousBatchingEngine(config, params, stacked, max_batch=2,
                                     max_len=64)
    rids = [eng_b.submit(p, max_new_tokens=6) for p in prompts]
    out_b = eng_b.run_until_complete(burst=1)
    for rid in rids:
        assert out_a[rid] == out_b[rid]


def test_burst_overrun_slot_reuse(setup):
    # A request finishing mid-burst frees its slot; a later admission into
    # that slot must generate correctly despite the overrun garbage KV.
    config, params, stacked = setup
    eng = ContinuousBatchingEngine(config, params, stacked, max_batch=1,
                                   max_len=64)
    r1 = eng.submit([5, 17, 3], max_new_tokens=2)   # finishes inside burst 4
    out1 = eng.run_until_complete(burst=4)
    r2 = eng.submit([9, 1, 2, 3], max_new_tokens=5)
    out2 = eng.run_until_complete(burst=4)

    ref = _reference_generate(config, params, stacked, [9, 1, 2, 3], 5)
    assert out2[r2] == ref


def _tiny_engine_setup(max_len=64, **kw):
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.batching import ContinuousBatchingEngine
    from fastforward_tpu.serving.stacked import (
        fuse_stacked_layers,
        random_stacked_params,
    )

    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, max_seq_len=256,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)
    return ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=max_len, **kw
    )


def test_chunked_prefill_matches_single_shot():
    # GIVEN the same long prompt WHEN prefilled in 16-token chunks vs one
    # shot THEN greedy generations agree (chunking is a scheduling choice,
    # not a numerics one).
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 256, (48,)).tolist()

    outs = {}
    for chunk in (16, 1024):
        engine = _tiny_engine_setup(max_len=128, prefill_chunk=chunk)
        rid = engine.submit(prompt, max_new_tokens=6)
        engine.run_until_complete()
        outs[chunk] = engine._done[rid].generated
    assert outs[16] == outs[1024], outs


def test_chunked_prefill_interleaves_decode():
    # An active request keeps generating while a long admission prefills.
    rng = np.random.RandomState(1)
    engine = _tiny_engine_setup(
        max_len=128, prefill_chunk=16, decode_between_chunks=2
    )
    first = engine.submit(rng.randint(0, 256, (8,)).tolist(), max_new_tokens=12)
    engine.step()  # admit + 1 decode step for the first request
    n_before = len(engine.slot_request[0].generated)
    # long prompt -> 3 chunks -> 2 interleaved bursts of 2 decode steps
    engine.submit(rng.randint(0, 256, (48,)).tolist(), max_new_tokens=4)
    engine._admit()
    n_after = len(
        (engine._done.get(first) or engine.slot_request[0]).generated
    )
    assert n_after >= n_before + 4, (n_before, n_after)


def test_cache_overflow_truncate():
    rng = np.random.RandomState(2)
    engine = _tiny_engine_setup(max_len=32, cache_overflow="truncate")
    rid = engine.submit(
        rng.randint(0, 256, (16,)).tolist(), max_new_tokens=100
    )
    engine.run_until_complete(burst=8)
    r = engine._done[rid]
    assert r.truncated and r.done
    assert 0 < len(r.generated) < 100


def test_cache_overflow_requeue_completes():
    rng = np.random.RandomState(3)
    engine = _tiny_engine_setup(max_len=32, cache_overflow="requeue")
    # needs 20 new tokens but the slot overflows at 32; requeue replays
    # prompt+generated (still < max_len) and finishes the budget
    rid = engine.submit(rng.randint(0, 256, (4,)).tolist(), max_new_tokens=20)
    engine.run_until_complete(burst=4)
    r = engine._done[rid]
    assert r.done and len(r.generated) == 20, (r.truncated, len(r.generated))
    assert not r.truncated


def test_submit_rejects_oversized_prompt():
    engine = _tiny_engine_setup(max_len=32)
    with pytest.raises(ValueError):
        engine.submit(list(range(40)), max_new_tokens=2)


def test_paged_engine_matches_slab(setup):
    # GIVEN the same request mix through a slab engine and a paged engine
    config, params, stacked = setup
    prompts = [[5, 17, 3], [9, 1, 2, 8, 4], [7], [11, 13]]

    def run(paged, **kw):
        eng = ContinuousBatchingEngine(
            config, params, stacked, max_batch=2, max_len=64,
            paged=paged, **kw,
        )
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        return eng.run_until_complete()

    slab = run(False)
    # WHEN paging with 32-token pages (slot reuse across 4 reqs / 2 slots)
    paged = run(True, page_size=32)
    # THEN greedy tokens agree request by request
    assert slab == paged


def test_paged_engine_dry_pool_requeues(setup):
    # GIVEN a pool with room for ~one active sequence (+ trash page)
    config, params, stacked = setup
    eng = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=64,
        paged=True, page_size=32, num_pages=3,
    )
    ref = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=64,
    )
    for p in ([5, 17, 3], [9, 1, 2, 8]):
        eng.submit(p, max_new_tokens=5)
        ref.submit(p, max_new_tokens=5)
    # WHEN running # THEN both requests still complete (second one waits
    # for pages) with the same greedy tokens as the unconstrained engine
    out = eng.run_until_complete()
    assert out == ref.run_until_complete()


def test_paged_submit_rejects_prompt_exceeding_pool(setup):
    # GIVEN a pool that can never hold the prompt (2 allocatable pages)
    config, params, stacked = setup
    eng = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=128,
        paged=True, page_size=32, num_pages=3,
    )
    # 2 pages cover 64 tokens; a 70-token prompt can never be admitted
    with pytest.raises(ValueError, match="pool"):
        eng.submit(list(range(70)), max_new_tokens=2)


def test_paged_no_progress_raises_instead_of_spinning(setup):
    # GIVEN two requests that each fit the pool alone but whose combined
    # budget outgrows it mid-flight with nothing retirable
    config, params, stacked = setup
    eng = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=128,
        paged=True, page_size=32, num_pages=3, cache_overflow="requeue",
    )
    # one request that overflows its 2-page allowance via requeue forever
    # would be caught by the overflow path; instead simulate an engine bug
    # (leaked pages) by draining the free list behind the allocator's back
    eng.submit([1, 2, 3], max_new_tokens=4)
    eng._alloc.free.clear()
    with pytest.raises(RuntimeError, match="cannot make progress"):
        eng.run_until_complete()


def test_paged_burst_does_not_leak_pages_on_dry_pool(setup):
    # GIVEN a tight pool with two active slots decoding in bursts
    config, params, stacked = setup
    eng = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=128,
        paged=True, page_size=16, num_pages=5,
    )
    for p in ([1, 2, 3], [4, 5, 6, 7]):
        eng.submit(p, max_new_tokens=40)
    eng.run_until_complete(burst=8)
    # THEN after every request retires, every allocatable page is free
    # again (a leak here permanently shrinks the pool — ADVICE r3)
    assert eng.num_active == 0
    assert eng._alloc.num_free == 4  # num_pages - trash page
    assert all(p == [] for p in eng._alloc.pages)


def test_engine_stats_counters(setup):
    # GIVEN two requests through burst decode
    config, params, stacked = setup
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=2, max_len=64
    )
    engine.submit([5, 17, 3], max_new_tokens=8)
    engine.submit([9, 1], max_new_tokens=8)
    engine.run_until_complete(burst=4)
    st = engine.stats
    # both requests delivered 8 tokens each; one arrives during admission
    assert st.admitted == 2
    assert st.useful_tokens + st.admitted == 16  # first token via prefill
    assert st.prefills >= 1
    assert st.decode_steps % 4 == 0 and st.decode_steps > 0
    assert st._slot_steps == st.decode_steps * 2
    assert st.useful_tokens + st.overrun_tokens == st._slot_steps
    assert st.decode_seconds > 0 and st.prefill_seconds > 0
    assert 0 < st.occupancy <= 1


def test_engine_occupancy_invariant_under_mixed_arrivals(setup):
    # Scheduling-quality regression: with requests always pending, slot
    # occupancy under staggered mixed-length arrivals must stay high —
    # a scheduler that strands slots or preempts spuriously fails this
    # without any timing involved (relay-independent).
    config, params, stacked = setup
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=4, max_len=64
    )
    rng = np.random.RandomState(0)
    arrivals = [rng.randint(0, 256, (int(n),)).tolist()
                for n in rng.choice([2, 4, 7, 12], size=12)]
    submitted = 0
    while submitted < len(arrivals) or engine.num_active or engine._pending:
        if submitted < len(arrivals):
            engine.submit(arrivals[submitted], max_new_tokens=6)
            submitted += 1
        engine.step_burst(2)
    st = engine.stats
    assert st.admitted == 12
    assert st.preempt_truncated == 0 and st.preempt_requeued == 0
    assert st.occupancy >= 0.5, st.occupancy
