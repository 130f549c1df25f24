"""Paged KV-cache kernels: page-table indirection for decode attention and
append.

The slab cache allocates (B, max_len) rows up front — a 128-slot engine
with an 8k bucket reserves 34 GB of KV whether or not anyone uses it.
Paging allocates fixed-size pages (default 256 tokens) from a shared pool
on demand; a per-sequence page table maps logical block i → physical page.

TPU-native design: the length-aware ragged flash decode
(`attention.py:_flash_decode_ragged_kernel`) already drives its own
manual-DMA pipeline over ceil(length/block) blocks — paging only changes
*where* each block's DMA reads from (one scalar lookup per block), so paged
attention inherits the O(true length) traffic property. The decode append
reuses the single-block-write formulation of `kv_update.py` with the page
lookup in the BlockSpec index maps.

Reference parity: the reference has no serving/KV subsystem (SURVEY §2.9);
this is new TPU capability (vLLM-style paged KV re-thought for Pallas).

Pool layout: k/v (L, P, Hkv, page, d) int8, scales (L, P, Hkv, page) f32.
A logical page covers the same token span across all L layers (one page id
→ L physical strips). Page table: (B, MP) int32, -1 for unallocated.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastforward_tpu.kernels.attention import NEG_INF, flash_decode_int8_reference


def gather_pages(pool: jax.Array, table_row: jax.Array) -> jax.Array:
    """(P, Hkv, page, ...) pool + (MP,) table row → contiguous (Hkv, MP*page, ...)."""
    pages = jnp.take(pool, jnp.maximum(table_row, 0), axis=0)  # (MP, Hkv, page, ...)
    pages = jnp.moveaxis(pages, 1, 0)                           # (Hkv, MP, page, ...)
    return pages.reshape(pages.shape[0], -1, *pages.shape[3:])


def paged_flash_decode_reference(
    q, k_pool_l, ks_pool_l, v_pool_l, vs_pool_l, table, lengths, scale=None,
):
    """Oracle: gather each sequence's pages into a contiguous view, then run
    the dense flash-decode reference."""
    k = jax.vmap(lambda t: gather_pages(k_pool_l, t))(table)
    ks = jax.vmap(lambda t: gather_pages(ks_pool_l, t))(table)
    v = jax.vmap(lambda t: gather_pages(v_pool_l, t))(table)
    vs = jax.vmap(lambda t: gather_pages(vs_pool_l, t))(table)
    return flash_decode_int8_reference(q, k, ks, v, vs, lengths, scale)


def _paged_flash_decode_kernel(
    sref,      # scalar prefetch: [layer, lengths(B), table(B*MP)] i32
    q_ref,     # (1, Hkv, G, d) VMEM
    k_hbm,     # (L, P, Hkv, page, d) int8 — pltpu.ANY
    ks_hbm,    # (L, P, Hkv, page) f32
    v_hbm,
    vs_hbm,
    out_ref,   # (1, Hkv, G, d)
    *,
    page: int,
    max_pages: int,
    n_batch: int,
    sm_scale: float,
    n_kv: int,
    groups: int,
    d: int,
):
    b = pl.program_id(0)
    layer = sref[0]
    length = sref[1 + b]
    n_blocks = jax.lax.div(length + page - 1, page)

    def page_id(i):
        return sref[1 + n_batch + b * max_pages + i]

    def scoped(kbuf, ksbuf, vbuf, vsbuf, sems):
        def copies(slot, i):
            p = page_id(i)
            return (
                pltpu.make_async_copy(
                    k_hbm.at[layer, p], kbuf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    ks_hbm.at[layer, p], ksbuf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    v_hbm.at[layer, p], vbuf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[layer, p], vsbuf.at[slot], sems.at[slot, 3]),
            )

        def start(slot, i):
            for c in copies(slot, i):
                c.start()

        def wait(slot, i):
            for c in copies(slot, i):
                c.wait()

        start(0, 0)
        q = q_ref[0].astype(jnp.bfloat16)                 # (Hkv, G, d)

        def body(i, carry):
            m, lsum, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _prefetch():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kf = kbuf[slot].astype(jnp.bfloat16)          # (Hkv, page, d)
            scores = jax.lax.dot_general(                 # (Hkv, G, page)
                q, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            scores = scores * ksbuf[slot][:, None, :] * sm_scale
            pos = i * page + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 2
            )
            scores = jnp.where(pos < length, scores, NEG_INF)

            m_prev = m[:, :, :1]
            m_cur = jnp.max(scores, axis=2, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            lsum = lsum * alpha + jnp.sum(p, axis=2, keepdims=True)
            pv = (p * vsbuf[slot][:, None, :]).astype(jnp.bfloat16)
            acc = acc * alpha + jax.lax.dot_general(
                pv, vbuf[slot].astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return jnp.broadcast_to(m_new, m.shape), lsum, acc

        m0 = jnp.full((n_kv, groups, 128), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n_kv, groups, 1), jnp.float32)
        acc0 = jnp.zeros((n_kv, groups, d), jnp.float32)
        m, lsum, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        out_ref[0] = (acc / jnp.maximum(lsum, 1e-20)).astype(out_ref.dtype)

    pl.run_scoped(
        scoped,
        kbuf=pltpu.VMEM((2, n_kv, page, d), jnp.int8),
        ksbuf=pltpu.VMEM((2, n_kv, page), jnp.float32),
        vbuf=pltpu.VMEM((2, n_kv, page, d), jnp.int8),
        vsbuf=pltpu.VMEM((2, n_kv, page), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def paged_flash_decode_int8(
    q: jax.Array,          # (B, H, d)
    k_pool: jax.Array,     # (L, P, Hkv, page, d) int8
    k_scale: jax.Array,    # (L, P, Hkv, page) f32
    v_pool: jax.Array,
    v_scale: jax.Array,
    table: jax.Array,      # (B, MP) int32 page ids (-1 = unallocated)
    lengths: jax.Array,    # (B,) int32
    layer: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Length-aware paged flash decode: block i of sequence b streams from
    physical page table[b, i]; traffic is O(true length) like the ragged
    kernel, with page indirection resolved from scalar memory per block."""
    B, H, d = q.shape
    L, P, Hkv, page, _ = k_pool.shape
    MP = table.shape[1]
    groups = H // Hkv
    sm_scale = float(scale if scale is not None else 1.0 / np.sqrt(d))

    from fastforward_tpu.kernels.matmul import _on_tpu

    if not _on_tpu() or groups < 2 or d % 128 != 0 or page % 128 != 0:
        kl = jax.lax.dynamic_index_in_dim(k_pool, layer, keepdims=False)
        ksl = jax.lax.dynamic_index_in_dim(k_scale, layer, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v_pool, layer, keepdims=False)
        vsl = jax.lax.dynamic_index_in_dim(v_scale, layer, keepdims=False)
        return paged_flash_decode_reference(
            q, kl, ksl, vl, vsl, table, lengths, scale
        )

    q4 = q.reshape(B, Hkv, groups, d)
    scalars = jnp.concatenate([
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        lengths.astype(jnp.int32),
        jnp.maximum(table, 0).reshape(-1).astype(jnp.int32),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, groups, d), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, groups, d), lambda b, s: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_flash_decode_kernel,
            page=page, max_pages=MP, n_batch=B, sm_scale=sm_scale,
            n_kv=Hkv, groups=groups, d=d,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(scalars, q4, k_pool, k_scale.astype(jnp.float32), v_pool,
      v_scale.astype(jnp.float32))
    return out.reshape(B, H, d)


# --- paged decode append -----------------------------------------------------


def paged_kv_append_reference(
    k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new, vs_new,
    positions, table, layer,
):
    """Oracle: write row ``positions[b]`` of each sequence into its page.

    k_pool (L, P, Hkv, page, d); k_new (B, Hkv, 1, d); positions (B,);
    table (B, MP). Scatter formulation (fine off the hot path).
    """
    L, P, Hkv, page, d = k_pool.shape
    B = positions.shape[0]
    page_idx = positions // page
    page_ids = jnp.take_along_axis(table, page_idx[:, None], axis=1)[:, 0]
    offs = positions % page

    def upd(pool, piece, pid, off, with_d):
        start = (layer, pid, 0, off) + ((0,) if with_d else ())
        return jax.lax.dynamic_update_slice(pool, piece.astype(pool.dtype), start)

    for b in range(B):
        k_pool = upd(k_pool, k_new[b].reshape(1, 1, Hkv, 1, d),
                     page_ids[b], offs[b], True)
        v_pool = upd(v_pool, v_new[b].reshape(1, 1, Hkv, 1, d),
                     page_ids[b], offs[b], True)
        ks_pool = upd(ks_pool, ks_new[b].reshape(1, 1, Hkv, 1),
                      page_ids[b], offs[b], False)
        vs_pool = upd(vs_pool, vs_new[b].reshape(1, 1, Hkv, 1),
                      page_ids[b], offs[b], False)
    return k_pool, v_pool, ks_pool, vs_pool


def _paged_append_kernel(
    sref,               # [layer, positions(B), table(B*MP)] i32
    kc_ref, vc_ref,     # (1, 1, Hkv, BS, D) — the page block holding the row
    ks_ref, vs_ref,     # (1, 1, Hkv, SBS)
    kn_ref, vn_ref,     # (1, Hkv, 1, D)
    ksn_ref, vsn_ref,   # (1, Hkv, 1)
    kc_out, vc_out, ks_out, vs_out,
    *,
    block_s: int,
    scale_block_s: int,
    page: int,
):
    b = pl.program_id(0)
    pos = sref[1 + b]
    off = pos % page

    r = off % block_s
    rows = jax.lax.broadcasted_iota(jnp.int32, kc_ref.shape, 3)
    sel = rows == r
    kn = jnp.broadcast_to(kn_ref[:][None], kc_ref.shape)
    vn = jnp.broadcast_to(vn_ref[:][None], vc_ref.shape)
    kc_out[:] = jnp.where(sel, kn, kc_ref[:])
    vc_out[:] = jnp.where(sel, vn, vc_ref[:])

    c = off % scale_block_s
    lanes = jax.lax.broadcasted_iota(jnp.int32, ks_ref.shape, 3)
    lsel = lanes == c
    ksn = jnp.broadcast_to(ksn_ref[:][None], ks_ref.shape)
    vsn = jnp.broadcast_to(vsn_ref[:][None], vs_ref.shape)
    ks_out[:] = jnp.where(lsel, ksn, ks_ref[:])
    vs_out[:] = jnp.where(lsel, vsn, vs_ref[:])


def paged_kv_append_decode_int8(
    k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new, vs_new,
    positions, table, layer,
    *,
    block_s: int = 32,
    scale_block_s: int = 128,
    interpret: bool = False,
):
    """In-place decode append into the paged pool: only the tile-aligned
    block of the target page moves through VMEM; the page lookup
    (``table[b, pos // page]``) happens in the BlockSpec index maps from
    scalar memory. Pool operands are donated (aliased)."""
    from fastforward_tpu.kernels.matmul import _on_tpu

    L, P, Hkv, page, D = k_pool.shape
    B, MP = table.shape
    ok = (
        (interpret or _on_tpu())
        and page % block_s == 0
        and page % scale_block_s == 0
        and D % 128 == 0
        and k_new.shape == (B, Hkv, 1, D)
    )
    if not ok:
        return paged_kv_append_reference(
            k_pool, v_pool, ks_pool, vs_pool, k_new, v_new, ks_new, vs_new,
            positions, table, layer,
        )

    f32 = jnp.float32
    scalars = jnp.concatenate([
        jnp.reshape(layer, (1,)).astype(jnp.int32),
        positions.astype(jnp.int32),
        jnp.maximum(table, 0).reshape(-1).astype(jnp.int32),
    ])

    def _page_of(b, s):
        return s[1 + B + b * MP + s[1 + b] // page]

    cache_spec = pl.BlockSpec(
        (1, 1, Hkv, block_s, D),
        lambda b, s: (s[0], _page_of(b, s), 0, (s[1 + b] % page) // block_s, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, 1, Hkv, scale_block_s),
        lambda b, s: (s[0], _page_of(b, s), 0,
                      (s[1 + b] % page) // scale_block_s),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        (1, Hkv, 1, D), lambda b, s: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    new_scale_spec = pl.BlockSpec(
        (1, Hkv, 1), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            cache_spec, cache_spec, scale_spec, scale_spec,
            new_spec, new_spec, new_scale_spec, new_scale_spec,
        ],
        out_specs=[cache_spec, cache_spec, scale_spec, scale_spec],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_append_kernel, block_s=block_s,
            scale_block_s=scale_block_s, page=page,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(ks_pool.shape, f32),
            jax.ShapeDtypeStruct(vs_pool.shape, f32),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        scalars,
        k_pool, v_pool, ks_pool.astype(f32), vs_pool.astype(f32),
        k_new.astype(k_pool.dtype), v_new.astype(v_pool.dtype),
        ks_new.astype(f32), vs_new.astype(f32),
    )
    return tuple(out)
