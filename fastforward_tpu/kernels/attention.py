"""Flash-decode attention over an INT8 KV cache.

The long-context decode bottleneck: at S=8k, batch 8, the KV cache read is
larger than the weight read. This kernel streams the *int8* cache tiles
through VMEM, dequantizing in-register (per-token-per-head scales), with the
classic online-softmax accumulation — KV HBM traffic stays at 1 byte/elem
and no dequantized copy of the cache ever exists.

Decode shape: one query token per sequence. GQA is handled by processing all
``H/Hkv`` query heads of a KV head together (they share the K/V tiles).

Like the other kernels: XLA reference implementation used on non-TPU
backends and as the numerical oracle.
"""

import functools
from typing import Optional

import jax

from fastforward_tpu import flags
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fit_block_s(S: int, block_s: int) -> int:
    """Largest candidate block size that divides S (Mosaic cannot slice
    padded lane tails); 0 when none of the candidates fit."""
    block_s = min(block_s, S)
    if S % block_s == 0:
        return block_s
    for candidate in (512, 256, 128):
        if candidate <= S and S % candidate == 0:
            return candidate
    return 0


def flash_decode_int8_reference(
    q: jax.Array,          # (B, H, d) bf16/f32
    k: jax.Array,          # (B, Hkv, S, d) int8
    k_scale: jax.Array,    # (B, Hkv, S) f32
    v: jax.Array,          # (B, Hkv, S, d) int8
    v_scale: jax.Array,    # (B, Hkv, S) f32
    lengths: jax.Array,    # (B,) int32 — valid cache length per sequence
    scale: Optional[float] = None,
) -> jax.Array:
    B, H, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    groups = H // Hkv
    sm_scale = scale if scale is not None else 1.0 / np.sqrt(d)

    kf = k.astype(jnp.float32) * k_scale[..., None]
    vf = v.astype(jnp.float32) * v_scale[..., None]
    kf = jnp.repeat(kf, groups, axis=1)
    vf = jnp.repeat(vf, groups, axis=1)
    scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), kf) * sm_scale
    mask = jnp.arange(S)[None, None, :] < lengths[:, None, None]
    scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhs,bhsd->bhd", weights, vf)
    return out.astype(q.dtype)


def _flash_decode_kernel(
    len_ref,  # scalar prefetch: (B,) lengths
    q_ref,    # (G, d)
    k_ref,    # (BS, d) int8
    ks_ref,   # (1, BS) f32
    v_ref,    # (BS, d) int8
    vs_ref,   # (1, BS) f32
    out_ref,  # (G, d)
    m_ref,    # scratch (G, 128) f32 — running max (lane-broadcast)
    l_ref,    # scratch (G, 128) f32 — running denominator
    acc_ref,  # scratch (G, d) f32
    *,
    block_s: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]
    start = s_idx * block_s

    @pl.when(start < length)
    def _process():
        kf = k_ref[:].astype(jnp.bfloat16)
        q = q_ref[:].astype(jnp.bfloat16)
        # scores (G, BS) = q @ k^T * k_scale * sm_scale
        scores = jax.lax.dot_general(
            q, kf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ks_ref[0][None, :] * sm_scale

        positions = start + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(positions < length, scores, NEG_INF)

        m_prev = m_ref[:, 0][:, None]                      # (G, 1)
        m_cur = jnp.max(scores, axis=1, keepdims=True)     # (G, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                    # (G, 1)
        p = jnp.exp(scores - m_new)                        # (G, BS)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        pv = p * vs_ref[0][None, :]                        # fold v scales
        vf = v_ref[:].astype(jnp.bfloat16)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            pv.astype(jnp.bfloat16), vf, preferred_element_type=jnp.float32
        )

    @pl.when(s_idx == n_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0][:, None], 1e-20)
        out_ref[:] = (acc_ref[:] / denom).astype(out_ref.dtype)


def _flash_decode_kernel_allheads(
    len_ref,   # scalar prefetch: (B,) lengths
    q_ref,     # (Hkv, G, d)
    k_ref,     # (Hkv, BS, d) int8
    ks_ref,    # (Hkv, 1, BS) f32
    v_ref,     # (Hkv, BS, d) int8
    vs_ref,    # (Hkv, 1, BS) f32
    out_ref,   # (Hkv, G, d)
    m_ref,     # scratch (Hkv, G, 128) f32
    l_ref,     # scratch (Hkv, G, 128) f32
    acc_ref,   # scratch (Hkv, G, d) f32
    *,
    n_kv: int,
    block_s: int,
    sm_scale: float,
    len_offset: int = 0,
    flat_scales: bool = False,
):
    """All KV heads of one sequence per grid step: 8x fewer grid iterations
    and MB-scale DMAs vs the per-(b,h) variant — the per-iteration DMA setup
    dominated at decode block sizes (measured ~25% of HBM peak)."""
    b = pl.program_id(0)
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[len_offset + b]
    start = s_idx * block_s

    @pl.when(start < length)
    def _process():
        for h in range(n_kv):
            kf = k_ref[h].astype(jnp.bfloat16)
            q = q_ref[h].astype(jnp.bfloat16)
            scores = jax.lax.dot_general(
                q, kf, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_sc = ks_ref[h] if flat_scales else ks_ref[h, 0]
            scores = scores * k_sc[None, :] * sm_scale
            positions = start + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            scores = jnp.where(positions < length, scores, NEG_INF)

            m_prev = m_ref[h, :, 0][:, None]
            m_cur = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)

            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])

            v_sc = vs_ref[h] if flat_scales else vs_ref[h, 0]
            pv = p * v_sc[None, :]
            vf = v_ref[h].astype(jnp.bfloat16)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot(
                pv.astype(jnp.bfloat16), vf, preferred_element_type=jnp.float32
            )

    @pl.when(s_idx == n_s - 1)
    def _finalize():
        for h in range(n_kv):
            denom = jnp.maximum(l_ref[h, :, 0][:, None], 1e-20)
            out_ref[h] = (acc_ref[h] / denom).astype(out_ref.dtype)


def _flash_decode_kernel_allheads_batched(
    len_ref,   # scalar prefetch: [layer, lengths...] (1+B,)
    q_ref,     # (Hkv, G, d)
    k_ref,     # (Hkv, BS, d) int8
    ks_ref,    # (Hkv, BS) f32
    v_ref,     # (Hkv, BS, d) int8
    vs_ref,    # (Hkv, BS) f32
    out_ref,   # (Hkv, G, d)
    m_ref,     # scratch (Hkv, G, 128) f32
    l_ref,     # scratch (Hkv, G, 128) f32
    acc_ref,   # scratch (Hkv, G, d) f32
    *,
    block_s: int,
    sm_scale: float,
    len_offset: int = 0,
):
    """Head-batched variant of `_flash_decode_kernel_allheads`: the per-head
    Python loop issued 16 M=4 dots and ran every VPU op on half-empty (G, BS)
    tiles, 8x serially. Batched `dot_general` (batch dim = Hkv) turns that
    into 2 dot instructions and full-height (Hkv, G, BS) vector ops."""
    b = pl.program_id(0)
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[len_offset + b]
    start = s_idx * block_s

    @pl.when(start < length)
    def _process():
        kf = k_ref[...].astype(jnp.bfloat16)          # (H, BS, d)
        q = q_ref[...].astype(jnp.bfloat16)           # (H, G, d)
        scores = jax.lax.dot_general(                 # (H, G, BS)
            q, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ks_ref[...][:, None, :] * sm_scale
        positions = start + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(positions < length, scores, NEG_INF)

        m_prev = m_ref[:, :, 0][..., None]            # (H, G, 1)
        m_cur = jnp.max(scores, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                   # (H, G, BS)

        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

        pv = (p * vs_ref[...][:, None, :]).astype(jnp.bfloat16)
        vf = v_ref[...].astype(jnp.bfloat16)          # (H, BS, d)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            pv, vf, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    @pl.when(s_idx == n_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :, 0][..., None], 1e-20)
        out_ref[...] = (acc_ref[...] / denom).astype(out_ref.dtype)


def flash_decode_int8_stacked(
    q: jax.Array,          # (B, H, d)
    k: jax.Array,          # (L, B, Hkv, S, d) int8 — full stacked cache
    k_scale: jax.Array,    # (L, B, Hkv, S) f32
    v: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,    # (B,) int32
    layer: jax.Array,      # scalar int32
    scale: Optional[float] = None,
    block_s: Optional[int] = None,
    s_blocks: Optional[int] = None,
) -> jax.Array:
    """Flash decode reading K/V of layer ``layer`` straight from the stacked
    cache via scalar-prefetch index maps.

    ``s_blocks`` (static) limits the grid to the first ``s_blocks`` KV
    blocks: the kernel only DMAs that prefix of the slab. Callers that know
    the batch's max live length (e.g. the decode loop via ``lax.switch``
    over bucket sizes) use it for O(live) instead of O(S) cache traffic —
    unlike the failed round-2 index-map clamp, the dead blocks are never in
    the grid at all, so there is no reliance on revisit DMA elision.

    With ``FF_FLASH_CLAMP=1`` the K/V block index maps are clamped to the
    last valid block (``min(s, (length-1)//block_s)``) aiming at O(length)
    instead of O(S) cache reads; measured a wash-to-negative at the bench's
    short lengths (docs/performance.md "Negative results") so it defaults
    OFF — by default the kernel reads the whole S extent and relies on the
    `start < length` compute skip only.

    Companion to `kv_append_decode_int8_stacked`: with the cache living in a
    layer-scan carry, neither the append nor the read ever materializes a
    per-layer slab (the xs/ys slab flow cost ~1.7 ms/step of copies on the
    8B batch-8 loop — profiler-traced). All-heads grid, same math as
    `_flash_decode_kernel_allheads`.
    """
    B, H, d = q.shape
    L, _, Hkv, S, _ = k.shape
    groups = H // Hkv
    sm_scale = float(scale if scale is not None else 1.0 / np.sqrt(d))
    clamp = flags.flash_clamp()
    if block_s is None:
        block_s = 256 if (clamp or s_blocks is not None) else 512

    from fastforward_tpu.kernels.matmul import _on_tpu

    block_s = _fit_block_s(S, block_s)
    if not _on_tpu() or groups < 2 or block_s == 0 or d % 128 != 0:
        kl = jax.lax.dynamic_index_in_dim(k, layer, keepdims=False)
        ksl = jax.lax.dynamic_index_in_dim(k_scale, layer, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v, layer, keepdims=False)
        vsl = jax.lax.dynamic_index_in_dim(v_scale, layer, keepdims=False)
        return flash_decode_int8_reference(q, kl, ksl, vl, vsl, lengths, scale)

    n_s = pl.cdiv(S, block_s)
    if s_blocks is not None:
        n_s = max(1, min(int(s_blocks), n_s))
    q4 = q.reshape(B, Hkv, groups, d)
    scalars = jnp.concatenate(
        [jnp.reshape(layer, (1,)).astype(jnp.int32), lengths.astype(jnp.int32)]
    )

    if clamp:
        def s_at(b, s, Ln):
            return jnp.minimum(s, (Ln[1 + b] - 1) // block_s)
    else:
        def s_at(b, s, Ln):
            return s

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_s),
        in_specs=[
            pl.BlockSpec((1, Hkv, groups, d), lambda b, s, Ln: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, Hkv, block_s, d),
                lambda b, s, Ln: (Ln[0], b, 0, s_at(b, s, Ln), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Hkv, block_s),
                lambda b, s, Ln: (Ln[0], b, 0, s_at(b, s, Ln)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Hkv, block_s, d),
                lambda b, s, Ln: (Ln[0], b, 0, s_at(b, s, Ln), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Hkv, block_s),
                lambda b, s, Ln: (Ln[0], b, 0, s_at(b, s, Ln)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, groups, d), lambda b, s, Ln: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, groups, 128), jnp.float32),
            pltpu.VMEM((Hkv, groups, d), jnp.float32),
        ],
    )

    batched = flags.flash_batched()

    def kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, m, l, acc):
        if batched:
            _flash_decode_kernel_allheads_batched(
                len_ref,
                q_ref.at[0], k_ref.at[0, 0], ks_ref.at[0, 0],
                v_ref.at[0, 0], vs_ref.at[0, 0], out_ref.at[0],
                m, l, acc, block_s=block_s, sm_scale=sm_scale, len_offset=1,
            )
        else:
            _flash_decode_kernel_allheads(
                len_ref,
                q_ref.at[0], k_ref.at[0, 0], ks_ref.at[0, 0],
                v_ref.at[0, 0], vs_ref.at[0, 0], out_ref.at[0],
                m, l, acc, n_kv=Hkv, block_s=block_s, sm_scale=sm_scale,
                len_offset=1, flat_scales=True,
            )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scalars, q4, k, k_scale.astype(jnp.float32), v,
      v_scale.astype(jnp.float32))
    return out.reshape(B, H, d)


def _flash_decode_ragged_kernel(
    len_ref,   # scalar prefetch: [layer, lengths...] (1+B,)
    q_ref,     # (1, Hkv, G, d) VMEM
    k_hbm,     # (L, B, Hkv, S, d) int8 — stays in HBM (pltpu.ANY)
    ks_hbm,    # (L, B, Hkv, S) f32
    v_hbm,
    vs_hbm,
    out_ref,   # (1, Hkv, G, d) VMEM
    *,
    block_s: int,
    sm_scale: float,
    n_kv: int,
    groups: int,
    d: int,
):
    """Length-aware flash decode: O(true length) HBM reads.

    The pipelined-grid variant reads all S blocks regardless of how much
    of the cache row is live (and the earlier index-map clamp attempt lost
    to refetch + halved blocks — docs/performance.md "Negative results").
    This kernel instead runs ONE grid step per sequence and drives its own
    double-buffered `make_async_copy` pipeline over
    ceil(length/block_s) blocks — a *dynamic* trip count, so a 160-token
    row in an S=512 (or 8k) slab moves 160 rows of cache, not S. At
    batch 128 the whole-S read is ~4.3 GB/step ≈ 40% of the decode step.
    """
    b = pl.program_id(0)
    layer = len_ref[0]
    length = len_ref[1 + b]
    n_blocks = jax.lax.div(length + block_s - 1, block_s)

    def scoped(kbuf, ksbuf, vbuf, vsbuf, sems):
        def copies(slot, i):
            base = i * block_s
            return (
                pltpu.make_async_copy(
                    k_hbm.at[layer, b, :, pl.ds(base, block_s), :],
                    kbuf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    ks_hbm.at[layer, b, :, pl.ds(base, block_s)],
                    ksbuf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    v_hbm.at[layer, b, :, pl.ds(base, block_s), :],
                    vbuf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[layer, b, :, pl.ds(base, block_s)],
                    vsbuf.at[slot], sems.at[slot, 3]),
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
            kf = kbuf[slot].astype(jnp.bfloat16)          # (Hkv, BS, d)
            scores = jax.lax.dot_general(                 # (Hkv, G, BS)
                q, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            scores = scores * ksbuf[slot][:, None, :] * sm_scale
            pos = i * block_s + jax.lax.broadcasted_iota(
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
        kbuf=pltpu.VMEM((2, n_kv, block_s, d), jnp.int8),
        ksbuf=pltpu.VMEM((2, n_kv, block_s), jnp.float32),
        vbuf=pltpu.VMEM((2, n_kv, block_s, d), jnp.int8),
        vsbuf=pltpu.VMEM((2, n_kv, block_s), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


def _flash_decode_ragged_xseq_kernel(
    len_ref,   # scalar prefetch: [layer, lengths...] (1+B,)
    q_ref,     # (1, Hkv, G, d) VMEM
    k_hbm,     # (L, B, Hkv, S, d) int8 — stays in HBM (pltpu.ANY)
    ks_hbm,    # (L, B, Hkv, S) f32
    v_hbm,
    vs_hbm,
    out_ref,   # (1, Hkv, G, d) VMEM
    kbuf, ksbuf, vbuf, vsbuf,   # scratch (2, Hkv, BS[, d]) — persist across
    cnt_ref,                    # SMEM (1,) global block counter
    sems,                       # DMA sems (2, 4)
    *,
    block_s: int,
    sm_scale: float,
    n_kv: int,
    groups: int,
    d: int,
    n_seqs: int,
):
    """Ragged flash decode with CROSS-SEQUENCE DMA pipelining.

    The per-sequence double buffer of `_flash_decode_ragged_kernel` has
    nothing to overlap when a sequence's live length fits one block — the
    serving bucket regime (S=512, live ≤ 256) degenerates to a serial
    DMA-wait-compute chain per grid step (measured −6% vs the pipelined
    whole-S grid, docs/performance.md r3). Here the buffers, semaphores,
    and a global block counter live in pallas scratch, which PERSISTS
    across grid steps: while sequence b computes its last block, the DMA
    for sequence b+1's first block is already in flight — the pipeline
    never drains at sequence boundaries, restoring whole-grid overlap
    while keeping O(true length) traffic.
    """
    b = pl.program_id(0)
    layer = len_ref[0]
    length = len_ref[1 + b]
    n_blocks = jax.lax.div(length + block_s - 1, block_s)

    def copies(slot, seq, i):
        base = i * block_s
        return (
            pltpu.make_async_copy(
                k_hbm.at[layer, seq, :, pl.ds(base, block_s), :],
                kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                ks_hbm.at[layer, seq, :, pl.ds(base, block_s)],
                ksbuf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                v_hbm.at[layer, seq, :, pl.ds(base, block_s), :],
                vbuf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                vs_hbm.at[layer, seq, :, pl.ds(base, block_s)],
                vsbuf.at[slot], sems.at[slot, 3]),
        )

    def start(slot, seq, i):
        for c in copies(slot, seq, i):
            c.start()

    def wait(slot, seq, i):
        for c in copies(slot, seq, i):
            c.wait()

    @pl.when(b == 0)
    def _first():
        cnt_ref[0] = 0
        start(0, 0, 0)

    cnt0 = cnt_ref[0]
    q = q_ref[0].astype(jnp.bfloat16)                 # (Hkv, G, d)

    def body(i, carry):
        m, lsum, acc = carry
        slot = jax.lax.rem(cnt0 + i, 2)
        nxt = jax.lax.rem(cnt0 + i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch_same_seq():
            start(nxt, b, i + 1)

        @pl.when((i + 1 == n_blocks) & (b + 1 < n_seqs))
        def _prefetch_next_seq():
            start(nxt, b + 1, 0)

        wait(slot, b, i)
        kf = kbuf[slot].astype(jnp.bfloat16)          # (Hkv, BS, d)
        scores = jax.lax.dot_general(                 # (Hkv, G, BS)
            q, kf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ksbuf[slot][:, None, :] * sm_scale
        pos = i * block_s + jax.lax.broadcasted_iota(
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
    cnt_ref[0] = cnt0 + n_blocks


def flash_decode_int8_stacked_ragged(
    q: jax.Array,          # (B, H, d)
    k: jax.Array,          # (L, B, Hkv, S, d) int8
    k_scale: jax.Array,    # (L, B, Hkv, S)
    v: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,    # (B,) int32
    layer: jax.Array,
    scale: Optional[float] = None,
    block_s: int = 256,
) -> jax.Array:
    """Length-aware variant of `flash_decode_int8_stacked` (FF_FLASH_RAGGED):
    manual double-buffered DMA with a dynamic per-sequence trip count —
    cache traffic is O(true length), not O(S). Same math/oracle."""
    B, H, d = q.shape
    L, _, Hkv, S, _ = k.shape
    groups = H // Hkv
    sm_scale = float(scale if scale is not None else 1.0 / np.sqrt(d))

    from fastforward_tpu.kernels.matmul import _on_tpu

    block_s = _fit_block_s(S, block_s)
    if not _on_tpu() or groups < 2 or block_s == 0 or d % 128 != 0:
        kl = jax.lax.dynamic_index_in_dim(k, layer, keepdims=False)
        ksl = jax.lax.dynamic_index_in_dim(k_scale, layer, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v, layer, keepdims=False)
        vsl = jax.lax.dynamic_index_in_dim(v_scale, layer, keepdims=False)
        return flash_decode_int8_reference(q, kl, ksl, vl, vsl, lengths, scale)

    q4 = q.reshape(B, Hkv, groups, d)
    scalars = jnp.concatenate(
        [jnp.reshape(layer, (1,)).astype(jnp.int32), lengths.astype(jnp.int32)]
    )
    xseq = flags.flash_ragged_xseq()
    scratch = []
    if xseq:
        scratch = [
            pltpu.VMEM((2, Hkv, block_s, d), jnp.int8),
            pltpu.VMEM((2, Hkv, block_s), jnp.float32),
            pltpu.VMEM((2, Hkv, block_s, d), jnp.int8),
            pltpu.VMEM((2, Hkv, block_s), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, groups, d), lambda b, Ln: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, groups, d), lambda b, Ln: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    body = (
        functools.partial(
            _flash_decode_ragged_xseq_kernel,
            block_s=block_s, sm_scale=sm_scale,
            n_kv=Hkv, groups=groups, d=d, n_seqs=B,
        )
        if xseq
        else functools.partial(
            _flash_decode_ragged_kernel,
            block_s=block_s, sm_scale=sm_scale,
            n_kv=Hkv, groups=groups, d=d,
        )
    )
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(scalars, q4, k, k_scale.astype(jnp.float32), v,
      v_scale.astype(jnp.float32))
    return out.reshape(B, H, d)


def flash_decode_int8(
    q: jax.Array,
    k: jax.Array,
    k_scale: jax.Array,
    v: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,
    scale: Optional[float] = None,
    block_s: int = 512,
) -> jax.Array:
    """Decode attention over int8 KV. Shapes as in the reference impl."""
    B, H, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    groups = H // Hkv
    sm_scale = float(scale if scale is not None else 1.0 / np.sqrt(d))

    from fastforward_tpu.kernels.matmul import _on_tpu

    # Pick a block size that divides S (Mosaic cannot slice padded lane
    # tails); fall back to the XLA path for hostile shapes or tiny GQA.
    block_s = _fit_block_s(S, block_s)
    if not _on_tpu() or groups < 2 or block_s == 0 or d % 128 != 0:
        return flash_decode_int8_reference(q, k, k_scale, v, v_scale, lengths, scale)

    n_s = pl.cdiv(S, block_s)
    q4 = q.reshape(B, Hkv, groups, d)

    # All-heads variant is the default (bench A/B at 8B: batch 8 465->479,
    # batch 32 955->1012 tok/s); FF_FLASH_ALLHEADS=0 selects the per-(b,h)
    # grid for comparison.
    if flags.flash_allheads():
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_s),
            in_specs=[
                pl.BlockSpec((1, Hkv, groups, d), lambda b, s, L: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, block_s, d), lambda b, s, L: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, block_s), lambda b, s, L: (b, 0, 0, s),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, block_s, d), lambda b, s, L: (b, 0, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, 1, block_s), lambda b, s, L: (b, 0, 0, s),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, groups, d), lambda b, s, L: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((Hkv, groups, 128), jnp.float32),
                pltpu.VMEM((Hkv, groups, 128), jnp.float32),
                pltpu.VMEM((Hkv, groups, d), jnp.float32),
            ],
        )

        def kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, m, l, acc):
            _flash_decode_kernel_allheads(
                len_ref,
                q_ref.at[0], k_ref.at[0], ks_ref.at[0],
                v_ref.at[0], vs_ref.at[0], out_ref.at[0],
                m, l, acc, n_kv=Hkv, block_s=block_s, sm_scale=sm_scale,
            )

        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(lengths.astype(jnp.int32), q4, k,
          k_scale.reshape(B, Hkv, 1, S).astype(jnp.float32), v,
          v_scale.reshape(B, Hkv, 1, S).astype(jnp.float32))
        return out.reshape(B, H, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, groups, d), lambda b, h, s, L: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, d), lambda b, h, s, L: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_s), lambda b, h, s, L: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_s, d), lambda b, h, s, L: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_s), lambda b, h, s, L: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, groups, d), lambda b, h, s, L: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, 128), jnp.float32),
            pltpu.VMEM((groups, 128), jnp.float32),
            pltpu.VMEM((groups, d), jnp.float32),
        ],
    )

    def kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, m, l, acc):
        _flash_decode_kernel(
            len_ref,
            q_ref.at[0, 0], k_ref.at[0, 0], ks_ref.at[0, 0],
            v_ref.at[0, 0], vs_ref.at[0, 0], out_ref.at[0, 0],
            m, l, acc, block_s=block_s, sm_scale=sm_scale,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lengths.astype(jnp.int32), q4, k,
      k_scale.reshape(B, Hkv, 1, S).astype(jnp.float32), v,
      v_scale.reshape(B, Hkv, 1, S).astype(jnp.float32))
    return out.reshape(B, H, d)


# =============================================================================
# Flash prefill attention (bf16 q, int8 or bf16 KV, causal, GQA — no repeat)
# =============================================================================


def flash_prefill_reference(
    q: jax.Array,                    # (B, H, T, d)
    k: jax.Array,                    # (B, Hkv, S, d) int8 or bf16
    k_scale: Optional[jax.Array],    # (B, Hkv, S) f32 when k is int8
    v: jax.Array,
    v_scale: Optional[jax.Array],
    starts: jax.Array,               # (B,) int32 — abs position of q row 0
    scale: Optional[float] = None,
) -> jax.Array:
    """Oracle: dense causal attention with the (T, S) score matrix.

    Query row t (absolute position starts[b]+t) attends K/V rows
    s <= starts[b]+t. Matches the engine's dense-mask formulation
    (`serving/stacked.py` mask construction) without materializing the
    additive mask tensor at the caller.
    """
    B, H, T, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    groups = H // Hkv
    sm_scale = scale if scale is not None else 1.0 / np.sqrt(d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[..., None]
    if v_scale is not None:
        vf = vf * v_scale[..., None]
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=1)
        vf = jnp.repeat(vf, groups, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kf) * sm_scale
    pos = starts[:, None] + jnp.arange(T)[None, :]            # (B, T)
    valid = jnp.arange(S)[None, None, None, :] <= pos[:, None, :, None]
    scores = jnp.where(valid, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", weights, vf)
    return out.astype(q.dtype)


def _flash_prefill_kernel(
    st_ref,    # scalar prefetch: (B,) starts
    q_ref,     # (G, BT, d)
    k_ref,     # (BS, d) int8/bf16
    ks_ref,    # (1, BS) f32 (all-ones when KV unquantized)
    v_ref,     # (BS, d)
    vs_ref,    # (1, BS) f32
    out_ref,   # (G, BT, d)
    m_ref,     # scratch (G*BT, 128) f32
    l_ref,     # scratch (G*BT, 128) f32
    acc_ref,   # scratch (G*BT, d) f32
    *,
    groups: int,
    block_t: int,
    block_s: int,
    sm_scale: float,
):
    # One (b, h_kv, t-block) tile against successive S blocks: classic
    # blocked online softmax; the G query heads of the KV group share the
    # K/V tile (GQA without jnp.repeat — reference `sdpa.py:93-265` has the
    # full-sequence math, the engine's dense path materialized (T, S)).
    b = pl.program_id(0)
    t_idx = pl.program_id(2)
    s_idx = pl.program_id(3)
    n_s = pl.num_programs(3)
    rows = groups * block_t

    @pl.when(s_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = st_ref[b]
    s0 = s_idx * block_s
    # Last absolute q position in this t-block; S blocks fully beyond the
    # causal frontier are skipped (≈2× fewer score blocks on a fresh prefill).
    t_last = start + t_idx * block_t + block_t - 1

    @pl.when(s0 <= t_last)
    def _process():
        q = q_ref[...].astype(jnp.bfloat16).reshape(rows, q_ref.shape[-1])
        kf = k_ref[...].astype(jnp.bfloat16)
        scores = jax.lax.dot_general(            # (rows, BS)
            q, kf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ks_ref[0][None, :] * sm_scale

        # causal mask: row r (head g, block row t) has abs position
        # start + t_idx*BT + (r % BT); valid iff s <= that position.
        r = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        t_abs = start + t_idx * block_t + jax.lax.rem(r, block_t)
        s_abs = s0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(s_abs <= t_abs, scores, NEG_INF)

        m_prev = m_ref[:, 0][:, None]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        pv = (p * vs_ref[0][None, :]).astype(jnp.bfloat16)
        vf = v_ref[...].astype(jnp.bfloat16)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            pv, vf, preferred_element_type=jnp.float32
        )

    @pl.when(s_idx == n_s - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0][:, None], 1e-20)
        out = (acc_ref[:] / denom).astype(out_ref.dtype)
        out_ref[...] = out.reshape(groups, block_t, out_ref.shape[-1])


def _fit_block(extent: int, candidates) -> int:
    for c in candidates:
        if c <= extent and extent % c == 0:
            return c
    return 0


def flash_prefill(
    q: jax.Array,                    # (B, H, T, d) bf16/f32
    k: jax.Array,                    # (B, Hkv, S, d) int8 or bf16
    k_scale: Optional[jax.Array],    # (B, Hkv, S) when int8, else None
    v: jax.Array,
    v_scale: Optional[jax.Array],
    starts: jax.Array,               # (B,) int32
    scale: Optional[float] = None,
    block_t: int = 128,
    block_s: int = 512,
) -> jax.Array:
    """Blocked causal prefill attention, O(T·S) compute but O(block²) memory:
    no (T, S) score materialization, no GQA KV repeat, int8 KV dequantized
    in-register. Falls back to the dense reference off-TPU or for hostile
    shapes. (Replaces the engine's dense einsum+mask prefill path —
    VERDICT round 1 item 5; at 8k context the dense path's (T, S) f32
    scores are 2 GB/head-batch.)
    """
    B, H, T, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    groups = H // Hkv
    sm_scale = float(scale if scale is not None else 1.0 / np.sqrt(d))

    from fastforward_tpu.kernels.matmul import _on_tpu

    bt = _fit_block(T, (block_t, 64, 32, 16, 8))
    bs = _fit_block_s(S, block_s)
    if not _on_tpu() or bt == 0 or bs == 0 or d % 128 != 0:
        return flash_prefill_reference(q, k, k_scale, v, v_scale, starts, scale)

    quantized = k.dtype == jnp.int8
    if k_scale is None:
        k_scale = jnp.ones((B, Hkv, S), jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones((B, Hkv, S), jnp.float32)

    q5 = q.reshape(B, Hkv, groups, T, d)
    n_t = pl.cdiv(T, bt)
    n_s = pl.cdiv(S, bs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_t, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, groups, bt, d),
                         lambda b, h, t, s, st: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, d), lambda b, h, t, s, st: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bs), lambda b, h, t, s, st: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, d), lambda b, h, t, s, st: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bs), lambda b, h, t, s, st: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, groups, bt, d), lambda b, h, t, s, st: (b, h, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((groups * bt, 128), jnp.float32),
            pltpu.VMEM((groups * bt, 128), jnp.float32),
            pltpu.VMEM((groups * bt, d), jnp.float32),
        ],
    )

    def kernel(st_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, m, l, acc):
        _flash_prefill_kernel(
            st_ref,
            q_ref.at[0, 0], k_ref.at[0, 0], ks_ref.at[0, 0],
            v_ref.at[0, 0], vs_ref.at[0, 0], out_ref.at[0, 0],
            m, l, acc,
            groups=groups, block_t=bt, block_s=bs, sm_scale=sm_scale,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, groups, T, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * d // 2,
            bytes_accessed=(
                B * H * T * d * 2 * 2
                + B * Hkv * S * d * (1 if quantized else 2) * 2
            ),
            transcendentals=B * H * T * S // 2,
        ),
    )(starts.astype(jnp.int32), q5, k, k_scale.reshape(B, Hkv, 1, S).astype(jnp.float32),
      v, v_scale.reshape(B, Hkv, 1, S).astype(jnp.float32))
    return out.reshape(B, H, T, d)
