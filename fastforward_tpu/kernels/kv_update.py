"""In-place decode-step KV-cache append kernel.

The decode step writes ONE new (k, v) token per sequence into a preallocated
int8 cache at a per-sequence offset. The two XLA-native formulations both
overspend HBM bandwidth:

- ``vmap(dynamic_update_slice)`` lowers to a scatter, which TPU executes as
  a serialized per-index loop (~0.5 ms/layer at batch 32);
- a dense masked ``jnp.where`` over the S axis is one fused VPU pass but
  re-reads and re-writes the whole cache every step (~67 MB/layer at
  batch 32, S=512 — grows linearly with context length).

This kernel touches only the (8,128)/(32,128)-tile-aligned block containing
the write position: grid = (B,), the scalar-prefetched ``starts`` drive the
BlockSpec index maps, and ``input_output_aliases`` donate the cache buffers
so unvisited blocks are never copied. Traffic per layer-step is
O(B * Hkv * block * D) bytes instead of O(B * Hkv * S * D).

Reference parity: the reference has no serving/KV subsystem (SURVEY §2.9);
this is new TPU capability. The XLA reference oracle below is the masked
select previously used in-line (serving/stacked.py, serving/kv_cache.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kv_append_decode_reference(kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts):
    """Masked-select oracle: write row ``starts[b]`` of the S axis.

    Shapes: kc/vc (B, Hkv, S, D) int8; ks/vs (B, Hkv, S) f32;
    k_new/v_new (B, Hkv, 1, D); ks_new/vs_new (B, Hkv, 1); starts (B,) i32.
    """
    S = kc.shape[2]
    sel = jnp.arange(S)[None, :] == starts[:, None]        # (B, S)
    sel4 = sel[:, None, :, None]
    sel3 = sel[:, None, :]
    return (
        jnp.where(sel4, k_new.astype(kc.dtype), kc),
        jnp.where(sel4, v_new.astype(vc.dtype), vc),
        jnp.where(sel3, ks_new.astype(ks.dtype), ks),
        jnp.where(sel3, vs_new.astype(vs.dtype), vs),
    )


def kv_append_decode_stacked_reference(
    kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts, layer
):
    """Oracle for the stacked append: update layer ``layer`` of (L, ...) arrays."""
    upd = kv_append_decode_reference(
        jax.lax.dynamic_index_in_dim(kc, layer, keepdims=False),
        jax.lax.dynamic_index_in_dim(vc, layer, keepdims=False),
        jax.lax.dynamic_index_in_dim(ks, layer, keepdims=False),
        jax.lax.dynamic_index_in_dim(vs, layer, keepdims=False),
        k_new, v_new, ks_new, vs_new, starts,
    )
    return (
        jax.lax.dynamic_update_index_in_dim(kc, upd[0].astype(kc.dtype), layer, 0),
        jax.lax.dynamic_update_index_in_dim(vc, upd[1].astype(vc.dtype), layer, 0),
        jax.lax.dynamic_update_index_in_dim(ks, upd[2].astype(ks.dtype), layer, 0),
        jax.lax.dynamic_update_index_in_dim(vs, upd[3].astype(vs.dtype), layer, 0),
    )


def _kv_update_stacked_kernel(
    sref,               # scalar prefetch: (1+B,) i32 — [layer, starts...]
    kc_ref, vc_ref,     # (1, 1, Hkv, BS, D) int8 — layer-l block at the row
    ks_ref, vs_ref,     # (1, 1, Hkv, SBS) f32
    kn_ref, vn_ref,     # (1, Hkv, 1, D)
    ksn_ref, vsn_ref,   # (1, Hkv, 1)
    kc_out, vc_out, ks_out, vs_out,
    *,
    block_s: int,
    scale_block_s: int,
):
    b = pl.program_id(0)
    start = sref[1 + b]

    r = start % block_s
    rows = jax.lax.broadcasted_iota(jnp.int32, kc_ref.shape, 3)
    sel = rows == r
    kn = jnp.broadcast_to(kn_ref[:][None], kc_ref.shape)
    vn = jnp.broadcast_to(vn_ref[:][None], vc_ref.shape)
    kc_out[:] = jnp.where(sel, kn, kc_ref[:])
    vc_out[:] = jnp.where(sel, vn, vc_ref[:])

    c = start % scale_block_s
    lanes = jax.lax.broadcasted_iota(jnp.int32, ks_ref.shape, 3)
    lsel = lanes == c
    ksn = jnp.broadcast_to(ksn_ref[:][None], ks_ref.shape)
    vsn = jnp.broadcast_to(vsn_ref[:][None], vs_ref.shape)
    ks_out[:] = jnp.where(lsel, ksn, ks_ref[:])
    vs_out[:] = jnp.where(lsel, vsn, vs_ref[:])


def kv_append_decode_int8_stacked(
    kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts, layer,
    *,
    block_s: int = 32,
    scale_block_s: int = 128,
    interpret: bool = False,
):
    """Layer-indexed in-place append into the *stacked* (L, B, Hkv, S, D)
    cache.

    Same single-block write as :func:`kv_append_decode_int8`, but the layer
    index rides scalar prefetch into the BlockSpec index maps, so the full
    stacked cache can live in a `lax.scan` carry with no per-layer
    slice/update-slice copies and no per-step whole-cache reassembly (the
    xs/ys formulation cost ~0.9 ms/step of slab copies + ~0.8 ms/step of
    whole-cache copies on the 8B batch-8 decode loop — profiler-traced).
    The cache operands are donated (aliased); only the written block moves.
    """
    from fastforward_tpu.kernels.matmul import _on_tpu

    L, B, Hkv, S, D = kc.shape
    ok = (
        (interpret or _on_tpu())
        and S % block_s == 0
        and S % scale_block_s == 0
        and D % 128 == 0
        and k_new.shape == (B, Hkv, 1, D)
    )
    if not ok:
        return kv_append_decode_stacked_reference(
            kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts, layer
        )

    f32 = jnp.float32
    ks_new = ks_new.astype(f32)
    vs_new = vs_new.astype(f32)
    scalars = jnp.concatenate(
        [jnp.reshape(layer, (1,)).astype(jnp.int32), starts.astype(jnp.int32)]
    )

    cache_spec = pl.BlockSpec(
        (1, 1, Hkv, block_s, D),
        lambda b, s: (s[0], b, 0, s[1 + b] // block_s, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, 1, Hkv, scale_block_s),
        lambda b, s: (s[0], b, 0, s[1 + b] // scale_block_s),
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

    kernel = functools.partial(
        _kv_update_stacked_kernel, block_s=block_s, scale_block_s=scale_block_s
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ks.shape, f32),
            jax.ShapeDtypeStruct(vs.shape, f32),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        scalars,
        kc, vc, ks.astype(f32), vs.astype(f32),
        k_new.astype(kc.dtype), v_new.astype(vc.dtype), ks_new, vs_new,
    )
    return tuple(out)


def _kv_update_kernel(
    len_ref,   # scalar prefetch (B,) i32
    kc_ref, vc_ref,     # (1, Hkv, BS, D) int8 — the block holding the row
    ks_ref, vs_ref,     # (1, Hkv, SBS) f32
    kn_ref, vn_ref,     # (1, Hkv, 1, D)
    ksn_ref, vsn_ref,   # (1, Hkv, 1)
    kc_out, vc_out, ks_out, vs_out,
    *,
    block_s: int,
    scale_block_s: int,
):
    b = pl.program_id(0)
    start = len_ref[b]

    r = start % block_s
    rows = jax.lax.broadcasted_iota(jnp.int32, kc_ref.shape, 2)
    sel = rows == r
    kc_out[:] = jnp.where(sel, jnp.broadcast_to(kn_ref[:], kc_ref.shape), kc_ref[:])
    vc_out[:] = jnp.where(sel, jnp.broadcast_to(vn_ref[:], vc_ref.shape), vc_ref[:])

    c = start % scale_block_s
    lanes = jax.lax.broadcasted_iota(jnp.int32, ks_ref.shape, 2)
    lsel = lanes == c
    ks_out[:] = jnp.where(lsel, jnp.broadcast_to(ksn_ref[:], ks_ref.shape), ks_ref[:])
    vs_out[:] = jnp.where(lsel, jnp.broadcast_to(vsn_ref[:], vs_ref.shape), vs_ref[:])


def kv_append_decode_int8(
    kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts,
    *,
    block_s: int = 32,
    scale_block_s: int = 128,
    interpret: bool = False,
):
    """Write one int8 (k, v) token + scales per sequence at ``starts[b]``.

    Only the cache block containing the target row moves through VMEM;
    the cache operands are donated (aliased) so the update is in place.
    Falls back to the XLA masked-select oracle off-TPU or for shapes the
    (32,128)/(8,128) tiling cannot cover.
    """
    from fastforward_tpu.kernels.matmul import _on_tpu

    B, Hkv, S, D = kc.shape
    ok = (
        (interpret or _on_tpu())
        and S % block_s == 0
        and S % scale_block_s == 0
        and D % 128 == 0
        and k_new.shape == (B, Hkv, 1, D)
    )
    if not ok:
        return kv_append_decode_reference(
            kc, vc, ks, vs, k_new, v_new, ks_new, vs_new, starts
        )

    f32 = jnp.float32
    ks_new = ks_new.astype(f32)
    vs_new = vs_new.astype(f32)

    cache_spec = pl.BlockSpec(
        (1, Hkv, block_s, D),
        lambda b, L: (b, 0, L[b] // block_s, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, Hkv, scale_block_s),
        lambda b, L: (b, 0, L[b] // scale_block_s),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        (1, Hkv, 1, D), lambda b, L: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    new_scale_spec = pl.BlockSpec(
        (1, Hkv, 1), lambda b, L: (b, 0, 0), memory_space=pltpu.VMEM
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

    kernel = functools.partial(
        _kv_update_kernel, block_s=block_s, scale_block_s=scale_block_s
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ks.shape, f32),
            jax.ShapeDtypeStruct(vs.shape, f32),
        ],
        # Flattened operand indices include the scalar-prefetch arg at 0.
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        kc, vc, ks.astype(f32), vs.astype(f32),
        k_new.astype(kc.dtype), v_new.astype(vc.dtype), ks_new, vs_new,
    )
    return tuple(out)
