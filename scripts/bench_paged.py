#!/usr/bin/env python
"""Paged-vs-slab decode A/B on real TPU (8B W4A8_2L, INT8 KV).

Scenario: a serving bucket of `VIRT` tokens (default 2048) with live
lengths of only ~prefill+steps. The slab cache must allocate B × VIRT KV
up front and (without the ragged kernel) read all of it every step; the
paged pool allocates pages for the LIVE tokens only — memory scales with
usage and attention is O(true length) by construction.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_paged.py
Env: PB_BATCH (32), PB_STEPS (32), PB_PREFILL (128), PB_VIRT (2048),
     PB_PAGE (256), PB_MODEL (8b).
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.paged import (
    PagedKVCache,
    PageAllocator,
    scatter_prefill_to_pages,
)
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    fuse_stacked_layers,
    make_stacked_decode_loop,
    random_stacked_params,
    serving_forward_stacked,
)


def main():
    B = int(os.environ.get("PB_BATCH", "32"))
    steps = int(os.environ.get("PB_STEPS", "32"))
    prefill_len = int(os.environ.get("PB_PREFILL", "128"))
    virt = int(os.environ.get("PB_VIRT", "2048"))
    page = int(os.environ.get("PB_PAGE", "256"))
    model = os.environ.get("PB_MODEL", "8b")
    config = {"8b": LlamaConfig.llama3_8b(), "1b": LlamaConfig.llama32_1b(),
              "tiny": LlamaConfig.tiny()}[model]

    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, config.vocab_size, (B, prefill_len))
    )

    # --- shared prefill into a tight slab, used to seed both flows --------
    seed_s = ((prefill_len + steps * 4 + 8 + 255) // 256) * 256
    seed_cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=B, max_len=seed_s,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    logits, seed_cache = jax.jit(
        lambda p, s, c, i: serving_forward_stacked(
            p, s, config, i, cache=c, logits_positions="last")
    )(params, stacked, seed_cache, ids)
    token = jnp.argmax(logits[:, -1], -1).astype(ids.dtype)[:, None]
    loop = make_stacked_decode_loop(config, num_steps=steps)

    def measure(cache, label, repeats=2):
        toks, c = loop(params, stacked, cache, token)   # compile + warm
        toks.block_until_ready()
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            toks, c = loop(params, stacked, c, token)
            toks.block_until_ready()
            np.asarray(toks[0, -1])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {B * steps / best:.1f} tok/s "
              f"({best / steps * 1e3:.2f} ms/step)")
        return np.asarray(toks)

    # --- slab flow at the virtual bucket size ------------------------------
    # PB_SKIP_SLAB=1 measures paged only: at large B×VIRT the slab does not
    # even allocate (e.g. 96×2048 ≈ 12.3 GiB KV next to 3.5 GiB weights),
    # which is precisely the regime paging exists for.
    toks_slab = None
    if os.environ.get("PB_SKIP_SLAB", "0") != "1":
        slab = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=B, max_len=virt,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        slab = dataclasses.replace(
            slab,
            k=slab.k.at[:, :, :, :seed_s].set(seed_cache.k),
            v=slab.v.at[:, :, :, :seed_s].set(seed_cache.v),
            k_scale=slab.k_scale.at[:, :, :, :seed_s].set(seed_cache.k_scale),
            v_scale=slab.v_scale.at[:, :, :, :seed_s].set(seed_cache.v_scale),
            length=seed_cache.length + 0,
        )
        slab_bytes = slab.k.size * 2 + slab.k_scale.size * 8
        toks_slab = measure(
            slab, f"slab  S={virt} ({slab_bytes/2**30:.2f} GiB KV)"
        )
        del slab

    # --- paged flow: pages for the live tokens only ------------------------
    mp = virt // page
    need_pages = -(-(prefill_len + steps * 4 + 8) // page)
    num_pages = B * need_pages + 8
    alloc = PageAllocator(num_pages, mp, B)
    for b in range(B):
        assert alloc.ensure(b, need_pages * page, page)
    paged = PagedKVCache.create(
        num_layers=config.num_layers, num_pages=num_pages, batch_size=B,
        max_pages_per_seq=mp, num_kv_heads=config.num_kv_heads,
        head_dim=config.head_dim, page_size=page,
    )
    for b in range(B):
        paged = scatter_prefill_to_pages(
            paged, seed_cache.k, seed_cache.v, seed_cache.k_scale,
            seed_cache.v_scale, b, alloc.pages[b],
        )
    paged = dataclasses.replace(
        paged, table=alloc.table_array(), length=seed_cache.length + 0
    )
    paged_bytes = paged.k.size * 2 + paged.k_scale.size * 8
    toks_paged = measure(
        paged, f"paged P={num_pages}x{page} ({paged_bytes/2**30:.2f} GiB KV)"
    )
    if toks_slab is not None:
        agree = (toks_slab == toks_paged).mean()
        print(f"greedy token agreement slab vs paged: {agree:.4f}")


if __name__ == "__main__":
    main()
