"""Paged KV cache for serving: pool + page tables + host-side allocator.

The slab `StackedKVCache` reserves (B, max_len) rows per sequence up front;
a paged cache allocates fixed-size pages from a shared pool on demand, so
device memory scales with the *live* token count, not batch × bucket — the
standard memory model for mixed-length continuous batching (vLLM), built
TPU-native on the ragged manual-DMA attention
(`kernels/paged_attention.py`).

Reference parity: no analog (the reference has no serving subsystem,
SURVEY §2.9) — new TPU capability.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Pool-backed KV cache.

    k/v: (L, P, Hkv, page, d) int8; scales (L, P, Hkv, page) f32;
    table: (B, MP) int32 page ids (-1 = unallocated). One logical page
    covers the same token span across all L layers.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    table: jax.Array
    length: jax.Array  # scalar int32 (uniform-decode convenience counter)

    @staticmethod
    def create(num_layers, num_pages, batch_size, max_pages_per_seq,
               num_kv_heads, head_dim, page_size=256):
        shape = (num_layers, num_pages, num_kv_heads, page_size, head_dim)
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:4], jnp.float32),
            v_scale=jnp.zeros(shape[:4], jnp.float32),
            table=jnp.full((batch_size, max_pages_per_seq), -1, jnp.int32),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_pages_per_seq(self) -> int:
        return self.table.shape[1]

    @property
    def is_quantized(self) -> bool:
        return True

    @property
    def max_len(self) -> int:
        return self.page_size * self.max_pages_per_seq


class PageAllocator:
    """Host-side free-list page allocator for one `PagedKVCache` pool.

    The device only ever sees the (B, MP) table the host maintains;
    allocation/free are O(1) list ops. `ensure(slot, n_tokens)` allocates
    enough pages for a sequence length BEFORE the jitted step runs, so the
    compiled program never observes an unallocated page.
    """

    def __init__(self, num_pages: int, max_pages_per_seq: int,
                 batch_size: int):
        self.free = list(range(num_pages))
        self.pages: list[list[int]] = [[] for _ in range(batch_size)]
        self.max_pages_per_seq = max_pages_per_seq
        self.batch_size = batch_size

    @property
    def num_free(self) -> int:
        return len(self.free)

    def ensure(self, slot: int, n_tokens: int, page_size: int) -> bool:
        """Allocate pages so `slot` can hold ``n_tokens``; False if the pool
        or the per-sequence table is exhausted (caller preempts).

        Failure rolls back pages allocated by THIS call (pages the slot
        already held stay) — a dry pool mid-growth must not leak the
        partial allocation onto a slot that is then requeued without a
        ``release`` (ADVICE r3: leaked pages permanently shrank the pool).
        """
        need = -(-n_tokens // page_size)
        if need > self.max_pages_per_seq:
            return False
        grown = 0
        while len(self.pages[slot]) < need:
            if not self.free:
                for _ in range(grown):
                    self.free.append(self.pages[slot].pop())
                return False
            self.pages[slot].append(self.free.pop())
            grown += 1
        return True

    def release(self, slot: int) -> None:
        self.free.extend(self.pages[slot])
        self.pages[slot] = []

    def table_array(self) -> jnp.ndarray:
        import numpy as np

        t = np.full((self.batch_size, self.max_pages_per_seq), -1, np.int32)
        for b, pages in enumerate(self.pages):
            t[b, : len(pages)] = pages
        return jnp.asarray(t)


def scatter_prefill_to_pages(
    cache: PagedKVCache, small_k, small_v, small_ks, small_vs,
    row: int, slot_pages: list[int], page_size: Optional[int] = None,
) -> PagedKVCache:
    """Copy one prefilled contiguous cache row ((L, B, Hkv, S, d) slab form)
    into the pool pages assigned to a slot — admission-time only (decode
    appends go through the paged Pallas kernel)."""
    page = page_size or cache.page_size
    k, v, ks, vs = cache.k, cache.v, cache.k_scale, cache.v_scale
    for i, pid in enumerate(slot_pages):
        s0 = i * page
        if s0 >= small_k.shape[3]:
            break
        piece_k = jax.lax.dynamic_slice_in_dim(small_k[:, row], s0, page, axis=2)
        piece_v = jax.lax.dynamic_slice_in_dim(small_v[:, row], s0, page, axis=2)
        piece_ks = jax.lax.dynamic_slice_in_dim(small_ks[:, row], s0, page, axis=2)
        piece_vs = jax.lax.dynamic_slice_in_dim(small_vs[:, row], s0, page, axis=2)
        k = k.at[:, pid].set(piece_k.astype(k.dtype))
        v = v.at[:, pid].set(piece_v.astype(v.dtype))
        ks = ks.at[:, pid].set(piece_ks.astype(ks.dtype))
        vs = vs.at[:, pid].set(piece_vs.astype(vs.dtype))
    return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)
