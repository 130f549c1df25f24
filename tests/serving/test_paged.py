"""Paged KV cache serving integration: paged decode == slab decode."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.paged import (
    PagedKVCache,
    PageAllocator,
    scatter_prefill_to_pages,
)
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    fuse_stacked_layers,
    random_stacked_params,
    serving_forward_stacked,
)


@pytest.fixture(scope="module")
def setup():
    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=8, num_kv_heads=2, head_dim=128, max_seq_len=512,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)
    return config, params, stacked


def test_paged_decode_matches_slab(setup, monkeypatch):
    # Compare against the slab STACKED-flash flow (FF_KV_STACKED=force) —
    # the formulation the paged kernels derive from; the slab *dense* CPU
    # flow differs from every flash formulation by bf16-q quantization
    # noise (~1e-1 on logits), which is not what this test measures.
    monkeypatch.setenv("FF_KV_STACKED", "force")
    config, params, stacked = setup
    B, prompt_len, page = 2, 40, 128
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 256, (B, prompt_len)))

    # slab flow: prefill + greedy decode steps
    slab = StackedKVCache.create(
        num_layers=2, batch_size=B, max_len=256,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    logits, slab = serving_forward_stacked(
        params, stacked, config, ids, cache=slab
    )
    tok_slab = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]

    # paged flow: same prefilled KV copied into shuffled pool pages
    alloc = PageAllocator(num_pages=8, max_pages_per_seq=2, batch_size=B)
    # deliberately interleave allocations so pages are non-contiguous
    for t in range(2):
        for b in range(B):
            alloc.ensure(b, (t + 1) * page, page)
    paged = PagedKVCache.create(
        num_layers=2, num_pages=8, batch_size=B, max_pages_per_seq=2,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        page_size=page,
    )
    for b in range(B):
        paged = scatter_prefill_to_pages(
            paged, slab.k, slab.v, slab.k_scale, slab.v_scale, b,
            alloc.pages[b],
        )
    paged = dataclasses.replace(
        paged, table=alloc.table_array(), length=slab.length
    )

    tok_s, tok_p = tok_slab, tok_slab
    for step in range(4):
        pos = jnp.full((B, 1), prompt_len + step, jnp.int32)
        ls, slab = serving_forward_stacked(
            params, stacked, config, tok_s, cache=slab, positions=pos
        )
        lp, paged = serving_forward_stacked(
            params, stacked, config, tok_p, cache=paged, positions=pos
        )
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lp), rtol=1e-5, atol=1e-5
        )
        tok_s = jnp.argmax(ls[:, -1], -1).astype(jnp.int32)[:, None]
        tok_p = jnp.argmax(lp[:, -1], -1).astype(jnp.int32)[:, None]
        assert (np.asarray(tok_s) == np.asarray(tok_p)).all()


def test_paged_prefill_shape_raises(setup):
    config, params, stacked = setup
    paged = PagedKVCache.create(
        num_layers=2, num_pages=4, batch_size=2, max_pages_per_seq=2,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
    )
    ids = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(ValueError):
        serving_forward_stacked(params, stacked, config, ids, cache=paged)


def test_allocator_exhaustion_and_release():
    alloc = PageAllocator(num_pages=4, max_pages_per_seq=4, batch_size=2)
    assert alloc.ensure(0, 3 * 128, 128)
    assert alloc.num_free == 1
    assert not alloc.ensure(1, 2 * 128, 128)   # pool exhausted mid-alloc
    # a failed ensure rolls back its partial allocation — the caller may
    # requeue the request without ever calling release (ADVICE r3 leak)
    assert alloc.num_free == 1
    assert alloc.pages[1] == []
    alloc.release(0)
    assert alloc.num_free == 4
    assert alloc.ensure(1, 2 * 128, 128)


def test_allocator_rollback_keeps_preexisting_pages():
    # GIVEN a slot that already holds pages and a nearly-dry pool
    alloc = PageAllocator(num_pages=5, max_pages_per_seq=4, batch_size=2)
    assert alloc.ensure(0, 2 * 64, 64)
    held = list(alloc.pages[0])
    assert alloc.ensure(1, 2 * 64, 64)
    assert alloc.num_free == 1
    # WHEN growing slot 0 by 2 pages when only 1 is free (partial growth)
    assert not alloc.ensure(0, 4 * 64, 64)
    # THEN only the pages taken by the failed call are returned
    assert alloc.pages[0] == held
    assert alloc.num_free == 1
