"""Fused dequantize-matmul Pallas kernels.

The execution tier replacing the reference's fake-quant hot path (SURVEY §7:
"Pallas fused dequant-matmul W8A8 and weight-only INT4 per-group"). Instead of
dequantize → HBM → matmul (two HBM round-trips), the kernels read the low-bit
weights once, dequantize in VMEM registers and feed the MXU directly:

  - `matmul_w8a8`: int8 activations (per-row scale) × int8 weights (per-column
    scale) → int32 MXU accumulate → fp epilogue scaling.
  - `matmul_w4a8`: packed-int4 per-group weights (g along K) × int8
    activations: per-group int8×int8 MXU dot, fp32 per-group scale-and-add.
  - `matmul_w4a16`: packed-int4 per-group weights dequantized to bf16
    in-kernel × bf16 activations (weight-only path).

Each kernel has an XLA reference implementation (`*_reference`) used for CPU
tests and as the numerical oracle. On non-TPU backends the public entry
points fall back to the reference implementation.

Measured on TPU v5e (this stack): XLA's native int8 dot reaches ~200 TOP/s
while a *pure bf16 Pallas matmul of identical structure* caps at ~36 TFLOP/s
(Mosaic scheduling gap on this toolchain), so:
  - `matmul_w8a8` routes through the XLA dot + fused scale epilogue (the
    Pallas variant is kept for completeness behind ``force_pallas=True``);
  - the W4 kernels stay Pallas — the fused in-VMEM nibble unpack beats every
    XLA alternative measured (62 vs 47 TOP/s best-XLA at M=4096, K=N=8192).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastforward_tpu import flags
from fastforward_tpu.kernels.packing import (
    pack_int4_vertical,
    pack_uint4_offset,
    pack_uint4_offset_paired,
    unpack_int4,
    unpack_uint4_offset,
    unpack_uint4_offset_paired,
)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def _round_block(value: int, multiple: int, cap: int) -> int:
    value = min(value, cap)
    return max(multiple, (value // multiple) * multiple)


# =============================================================================
# W8A8
# =============================================================================


def matmul_w8a8_reference(
    x_q: jax.Array, x_scale: jax.Array, w_q: jax.Array, w_scale: jax.Array,
    bias: Optional[jax.Array] = None, out_dtype=jnp.bfloat16,
) -> jax.Array:
    acc = jax.lax.dot(
        x_q.astype(jnp.int32), w_q.astype(jnp.int32),
        precision=None, preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale[:, None] * w_scale[None, :]
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def _w8a8_kernel(x_ref, xs_ref, w_ref, ws_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == n_k - 1)
    def _epilogue():
        scaled = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        out_ref[:] = scaled.astype(out_ref.dtype)


def matmul_w8a8(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    force_pallas: bool = False,
) -> jax.Array:
    """``(x_q @ w_q) * x_scale[:,None] * w_scale[None,:] (+bias)``.

    x_q: (M, K) int8, x_scale: (M,) f32 per-row (dynamic per-token),
    w_q: (K, N) int8, w_scale: (N,) f32 per-out-channel.

    Default path is the XLA int8 MXU dot with the scale epilogue fused by
    XLA — measured ~200 TOP/s vs ~25 for the Pallas variant on this stack.
    """
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2
    if not force_pallas or not _on_tpu() or M < 8:
        return matmul_w8a8_reference(x_q, x_scale, w_q, w_scale, bias, out_dtype)

    bm = _round_block(block_m, 8, M)
    bn = _round_block(block_n, 128, N)
    bk = _round_block(block_k, 128, K)
    n_k = pl.cdiv(K, bk)

    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_k)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(x_q, x_scale.reshape(M, 1).astype(jnp.float32), w_q,
      w_scale.reshape(1, N).astype(jnp.float32))
    if bias is not None:
        out = (out.astype(jnp.float32) + bias).astype(out_dtype)
    return out


# =============================================================================
# W4A8: packed int4 per-group weights, int8 activations
# =============================================================================


def matmul_w4a8_reference(
    x_q: jax.Array, x_scale: jax.Array, w_packed: jax.Array, w_scale: jax.Array,
    bias: Optional[jax.Array] = None, group_size: int = 128, out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Oracle: unpack, per-group int32 dots, fp32 scale-and-sum."""
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    w = unpack_int4(w_packed, group_size)  # (K, N) int8
    xg = x_q.reshape(M, n_groups, group_size).astype(jnp.int32)
    wg = w.reshape(n_groups, group_size, N).astype(jnp.int32)
    acc = jnp.einsum("mgk,gkn->gmn", xg, wg)  # int32 (g, M, N)
    out = jnp.sum(
        acc.astype(jnp.float32) * w_scale.astype(jnp.float32)[:, None, :], axis=0
    )
    out = out * x_scale[:, None]
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def _unpack_tile(packed: jax.Array) -> jax.Array:
    """Unpack an int8 tile of packed int4 pairs → int8 rows in order.

    Mosaic cannot legalize shifts on int8 vectors, so the nibble math runs in
    int32 with the xor-subtract sign-extension trick:
    ``((nibble ^ 8) - 8)`` maps [0, 15] → [-8, 7].
    """
    p32 = packed.astype(jnp.int32)
    low = (jnp.bitwise_and(p32, 15) ^ 8) - 8
    high = (jnp.bitwise_and(p32 >> 4, 15) ^ 8) - 8
    return jnp.concatenate([low, high], axis=0).astype(jnp.int8)


def matmul_w4a8(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
) -> jax.Array:
    """Per-group W4A8 matmul.

    x_q: (M, K) int8 with per-row scale x_scale (M,);
    w_packed: (K//2, N) int8 (see `packing.pack_int4`);
    w_scale: (K//group_size, N) per-group fp scale.
    """
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    assert w_scale.shape == (n_groups, N), (w_scale.shape, (n_groups, N))
    if not _on_tpu():
        return matmul_w4a8_reference(
            x_q, x_scale, w_packed, w_scale, bias, group_size, out_dtype
        )
    if M <= _GEMV_MAX_M:
        out = matmul_w4a8_gemv(
            x_q, x_scale, w_packed, w_scale, group_size, out_dtype
        )
        if bias is not None:
            out = (out.astype(jnp.float32) + bias).astype(out_dtype)
        return out
    # Prefill: one-pass Pallas dequant to bf16, then XLA's full-rate matmul
    # (2.2x over the fused-block kernel on this toolchain; see CLAUDE.md).
    w = dequantize_int4(w_packed, w_scale, group_size)
    xb = (x_q.astype(jnp.float32) * x_scale[:, None]).astype(jnp.bfloat16)
    out = jax.lax.dot(xb, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


# =============================================================================
# W4 GEMV (decode path): small-M panel kernel
# =============================================================================


def _w4_gemv_kernel(x_ref, wp_ref, ws_ref, out_ref, *, n_groups: int, half: int):
    # Unpack a full-K weight panel in one shot, then a single large-K dot.
    # i32-wide nibble extraction (int8 shifts are not legal in Mosaic); the
    # extracted bytes hold the raw two's-complement patterns u ∈ [0, 15].
    # Sign extension happens in bf16: w = (u_xor8 - 8)·s, using u ^ 8 at i32
    # width (bitwise, no cross-byte effects) so the arithmetic part is a
    # plain subtract-8.
    p32 = pltpu.bitcast(wp_ref[:], jnp.int32)
    low = pltpu.bitcast(jnp.bitwise_and(p32, 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
    high = pltpu.bitcast(
        jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) ^ 0x08080808, jnp.int8
    )
    bn = low.shape[-1]
    lowg = low.reshape(n_groups, half, bn)
    highg = high.reshape(n_groups, half, bn)
    u = jnp.concatenate([lowg, highg], axis=1).astype(jnp.bfloat16) - 8.0
    w = (u * ws_ref[:].astype(jnp.bfloat16)).reshape(n_groups * 2 * half, bn)
    out_ref[:] = jax.lax.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def matmul_w4_gemv(
    x: jax.Array,
    w_packed: jax.Array,
    w_scale: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: int = 256,
) -> jax.Array:
    """Decode-shaped (small M) weight-only int4 matmul: grid over N panels
    only, whole-K unpack per panel, one large-K MXU dot. Measured ≈ the XLA
    int8 GEMV per byte-of-weights on v5e (the launch/VPU-bound regime)."""
    M, K = x.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    half = group_size // 2
    bm = max(8, M)
    if M < 8:
        x = jnp.pad(x, ((0, 8 - M), (0, 0)))
    bn = _round_block(block_n, 128, N)
    out = pl.pallas_call(
        functools.partial(_w4_gemv_kernel, n_groups=n_groups, half=half),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K * 2 + bm * N * 2,
            transcendentals=0,
        ),
    )(x.astype(jnp.bfloat16), w_packed, w_scale.astype(jnp.float32).reshape(n_groups, 1, N))
    return out[:M]


# Decode-vs-prefill routing threshold for the W4 kernels. The
# weight-streaming GEMV's panel traffic is M-independent (the weight panel
# dominates), so decode throughput scales near-linearly with batch; above
# one MXU tile (128 rows) the stationary weights are simply reused for a
# second MXU pass — still one weight read per step. 256 covers the
# batch-192 serving point (batch 160/192 unlocked by the stacked-carry
# prefill, r4); beyond that the activation tiles start crowding VMEM and
# prefill-style dequant wins anyway.
_GEMV_MAX_M = 256


def _w4a8_gemv_kernel(x_ref, xs_ref, rs_ref, wp_ref, ws_ref, out_ref, acc_ref,
                      *, n_groups: int, half: int):
    """int8-MXU W4A8 GEMV: offset-binary nibbles feed int8 dots directly.

    One xor at i32 width turns the stored two's-complement nibble pattern
    into u = v + 8 ∈ [0, 15] (valid int8, no sign extension needed); the
    bias is corrected with precomputed per-group activation row-sums:
    dot(x, v) = dot(x, u) − 8·rowsum. Total VPU cost ≈ 1 op/weight — ~4×
    less than the dequantize-to-bf16 chain, which makes decode HBM-bound.

    The group loop is a static Python unroll: Mosaic rejects dynamic
    lane/sublane slices here, and n_groups is compile-time constant.
    """
    G = 2 * half
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for g in range(n_groups):
        xg = x_ref[:, g * G:(g + 1) * G]
        p32 = pltpu.bitcast(wp_ref[g * half:(g + 1) * half, :], jnp.int32)
        ulo = pltpu.bitcast(jnp.bitwise_and(p32, 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
        uhi = pltpu.bitcast(
            jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) ^ 0x08080808, jnp.int8
        )
        gdot = jax.lax.dot(xg[:, :half], ulo, preferred_element_type=jnp.int32)
        gdot += jax.lax.dot(xg[:, half:], uhi, preferred_element_type=jnp.int32)
        corr = gdot.astype(jnp.float32) - 8.0 * rs_ref[:, g:g + 1]
        acc_ref[:] += corr * ws_ref[g, 0, :]
    out_ref[:] = (acc_ref[:] * xs_ref[:]).astype(out_ref.dtype)


def matmul_w4a8_gemv(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    w_scale: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: int = 512,
) -> jax.Array:
    """Decode-shaped W4A8 matmul on the int8 MXU path (see kernel docs)."""
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    half = group_size // 2
    bm = max(8, M)
    if M < 8:
        x_q = jnp.pad(x_q, ((0, 8 - M), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, 8 - M))
    rowsum = jnp.sum(
        x_q.astype(jnp.int32).reshape(bm, n_groups, group_size), axis=2
    ).astype(jnp.float32)
    bn = _round_block(block_n, 128, N)
    out = pl.pallas_call(
        functools.partial(_w4a8_gemv_kernel, n_groups=n_groups, half=half),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n_groups), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(x_q, x_scale.reshape(bm, 1).astype(jnp.float32), rowsum, w_packed,
      w_scale.astype(jnp.float32).reshape(n_groups, 1, N))
    return out[:M]


# =============================================================================
# Two-level W4A8 (decode): per-group INTEGER multipliers on a per-column grid
# =============================================================================
#
# The per-group-float-scale GEMV above must issue 2 small MXU dots per
# (group, N-panel) — ~6.6k dots per Llama-8B layer — because the f32 group
# scale can only be applied after each group's integer partial. Measured on
# v5e this is MXU-issue-bound at ~4x the weight-read roofline.
#
# The two-level format (progressive quantization in the style of the QServe
# W4A8 scheme) constrains every group scale to an integer multiple of a
# per-column scale:  w ≈ s_col[n] * (m[g,n] * v4),  m ∈ [1, 15] int.
# Then m folds into the *integer* weights in-kernel (v8 = v4·m stays in
# int8: |v4|≤8, m≤15 → |v8|≤120) and the whole K dimension collapses into
# one int8 MXU dot per panel chunk — ~200 dots/layer instead of 6.6k.
#
# In-kernel cost is ~1 VPU op/weight via packed-i32 nibble math: with 4
# packed bytes u ∈ [0,15] per i32 (offset-binary after the xor) and m ≤ 15,
# every byte product u·m ≤ 225 < 256, so a single i32 multiply scales all 4
# bytes with no cross-byte carry; the offset is removed afterwards in int8
# domain (v8 = (u·m as int8) − 8·m, exact under modular int8 arithmetic).


def convert_two_level(
    w_packed: jax.Array, w_scale: jax.Array, group_size: int = 128,
    paired: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Requantize float-per-group W4 onto the two-level grid.

    Returns ``(packed', mult, s_col)`` with ``mult`` (n_groups, N) int8 in
    [1, 15] and ``s_col`` (N,) f32; the effective per-group scale becomes
    ``mult * s_col`` (exactly representable — parity with the simulation
    tier is preserved by using that product as the sim scale). ``packed'``
    stores *offset-binary* nibbles; with ``paired`` (the default when the
    group count is even) in the adjacent-group pairing
    (`pack_uint4_offset_paired`) the concat-free decode kernel consumes.
    """
    n_groups, N = w_scale.shape
    K = w_packed.shape[0] * 2
    g = group_size
    if paired is None:
        paired = flags.default_paired_layout() and n_groups % 2 == 0
    s = w_scale.astype(jnp.float32)
    s_col = jnp.maximum(jnp.max(s, axis=0) / 15.0, 1e-12)  # (N,)
    m = jnp.clip(jnp.round(s / s_col[None, :]), 1, 15)
    s_eff = m * s_col[None, :]
    v = unpack_int4(w_packed, g).astype(jnp.float32).reshape(n_groups, g, N)
    w = v * s[:, None, :]
    v2 = jnp.clip(jnp.round(w / s_eff[:, None, :]), -8, 7).astype(jnp.int8)
    pack = pack_uint4_offset_paired if paired else pack_uint4_offset
    return (
        pack(v2.reshape(K, N), group_size=g),
        m.astype(jnp.int8),
        s_col,
    )


def matmul_w4a8_2l_reference(
    x_q: jax.Array, x_scale: jax.Array, w_packed: jax.Array, mult: jax.Array,
    s_col: jax.Array, bias: Optional[jax.Array] = None, group_size: int = 128,
    out_dtype=jnp.bfloat16, paired: Optional[bool] = None,
) -> jax.Array:
    """Oracle: integer math end-to-end, then one fp scaling.

    ``w_packed`` is in the offset-binary at-rest layout —
    `pack_uint4_offset_paired` when ``paired`` (the default for even group
    counts, matching `convert_two_level`), else `pack_uint4_offset`.
    """
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    if paired is None:
        paired = flags.default_paired_layout() and n_groups % 2 == 0
    unpack = unpack_uint4_offset_paired if paired else unpack_uint4_offset
    v = unpack(w_packed, group_size).reshape(
        n_groups, group_size, N
    )
    w8 = (v.astype(jnp.int32) * mult.astype(jnp.int32)[:, None, :]).reshape(K, N)
    acc = jax.lax.dot(
        x_q.astype(jnp.int32), w8, preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * s_col[None, :] * x_scale[:, None]
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


# 0x80808080 as a wrapped int32 literal (int32 arithmetic is modular, so the
# byte-level reasoning below holds on bit patterns regardless of sign).
_B0x80 = -2139062144


def _w4a8_2l_gemv_kernel(
    x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref, acc_ref,
    *, n_groups: int, half: int, concat_groups: int, nofold: bool = False,
):
    # SWAR scale-fold: with 4 packed offset-binary nibbles u = v+8 ∈ [0,15]
    # per i32 and m ∈ [1,15]:
    #   u·m ≤ 225            → the packed multiply has no cross-byte carry;
    #   (u·m) + (128 − 8m)   → per-byte v·m + 128 ∈ [8, 233], carry-free
    #                          (both addends < 256, sum < 256);
    #   XOR 0x80             → two's-complement pattern of v·m ∈ [−120, 105]
    #                          (offset-binary → signed, exact).
    # All arithmetic stays in packed-i32 vectors — Mosaic has no int8
    # add/sub/mul legalization, and this needs none.
    # Scratch-free: per concat-block, fold `concat_groups` adjacent groups'
    # scales into signed int8 bytes in-register, concatenate along K (the
    # groups are K-adjacent, so activation slices stay contiguous) and issue
    # one whole-block MXU dot. A VMEM-scratch variant (materialize a big w8
    # panel, then one giant dot) measured ~25% slower end-to-end on v5e —
    # the store→load round-trip serializes against the dot.
    #
    # The at-rest nibbles are already offset-binary (u = v+8, see
    # `pack_uint4_offset`), so the fold is AND/MUL/ADD/XOR per plane —
    # the offset XOR was hoisted to pack time (the decode path is
    # VPU-bound; every packed op counts).
    G = 2 * half
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def fold(g):
        p32 = pltpu.bitcast(wp_ref[g * half:(g + 1) * half, :], jnp.int32)
        if nofold:
            # Diagnostic only (FF_2L_NOFOLD=1): wrong numerics, same memory
            # traffic and dot structure — isolates the VPU fold cost.
            w = pltpu.bitcast(jnp.bitwise_and(p32, 0x0F0F0F0F), jnp.int8)
            return w, w
        m32 = m_ref[g, 0, :].reshape(1, -1)
        bias32 = _B0x80 - m32 * 0x08080808  # bytes: 128 − 8m ∈ [8, 120]
        lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m32
        hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m32
        return (
            pltpu.bitcast((lo + bias32) ^ _B0x80, jnp.int8),
            pltpu.bitcast((hi + bias32) ^ _B0x80, jnp.int8),
        )

    for c in range(n_groups // concat_groups):
        parts = []
        for gg in range(concat_groups):
            v_lo, v_hi = fold(c * concat_groups + gg)
            parts += [v_lo, v_hi]
        w8 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        acc_ref[:] += jax.lax.dot(
            x_ref[:, c * concat_groups * G:(c + 1) * concat_groups * G], w8,
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        acc_ref[:].astype(jnp.float32) * sc_ref[:] * xs_ref[:]
    ).astype(out_ref.dtype)


def _w4a8_2l_gemv_kernel_paired(
    x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref, acc_ref,
    *, n_groups: int, group: int,
):
    # Paired-group layout (`pack_uint4_offset_paired`): the lo/hi nibble
    # planes of a pair block are complete 128-row dot operands for groups
    # 2p and 2p+1 — same SWAR fold as `_w4a8_2l_gemv_kernel`, but no
    # jnp.concatenate between fold and dot (the concat's VMEM round-trip
    # serialized against the MXU; measured ~12% of the GEMV loop).
    acc_ref[:] = jnp.zeros_like(acc_ref)

    for p in range(n_groups // 2):
        p32 = pltpu.bitcast(
            wp_ref[p * group:(p + 1) * group, :], jnp.int32
        )
        m_lo = m_ref[2 * p, 0, :].reshape(1, -1)
        m_hi = m_ref[2 * p + 1, 0, :].reshape(1, -1)
        lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
        hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
        w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
        w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
        acc_ref[:] += jax.lax.dot(
            x_ref[:, 2 * p * group:(2 * p + 1) * group], w_lo,
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += jax.lax.dot(
            x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], w_hi,
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        acc_ref[:].astype(jnp.float32) * sc_ref[:] * xs_ref[:]
    ).astype(out_ref.dtype)


def matmul_w4a8_2l_gemv(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    mult: jax.Array,
    s_col: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: int = 512,
    paired: Optional[bool] = None,
) -> jax.Array:
    """Decode-shaped two-level W4A8 matmul: one whole-chunk int8 MXU dot per
    N panel (vs 2 dots per group in `matmul_w4a8_gemv`).

    ``paired``: w_packed uses the `pack_uint4_offset_paired` at-rest layout
    (adjacent-group nibble pairing — concat-free kernel). Defaults to the
    FF_2L_PAIRED env (on unless FF_2L_PAIRED=0).
    """
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    half = group_size // 2
    if paired is None:
        paired = flags.default_paired_layout() and n_groups % 2 == 0
    if not _on_tpu():
        return matmul_w4a8_2l_reference(
            x_q, x_scale, w_packed, mult, s_col, None, group_size, out_dtype,
            paired=paired,
        )
    bm = max(8, M)
    if M < 8:
        x_q = jnp.pad(x_q, ((0, 8 - M), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, 8 - M))

    max_cat = flags.two_level_concat()
    concat_groups = next(
        c for c in (max_cat, 8, 4, 2, 1) if c <= max_cat and n_groups % c == 0
    )
    if paired:
        kernel = functools.partial(
            _w4a8_2l_gemv_kernel_paired, n_groups=n_groups, group=group_size
        )
    else:
        kernel = functools.partial(
            _w4a8_2l_gemv_kernel,
            n_groups=n_groups, half=half, concat_groups=concat_groups,
            nofold=flags.two_level_nofold(),
        )
    bn = _round_block(block_n, 128, N)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 1, bn), lambda j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(x_q, x_scale.reshape(bm, 1).astype(jnp.float32), w_packed,
      mult.astype(jnp.int32).reshape(n_groups, 1, N),
      s_col.astype(jnp.float32).reshape(1, N))
    return out[:M]


# Python float (not a jnp scalar: a traced constant may not be captured by a
# Pallas kernel body) well below any representable logit.
_NEG_BIG = -3.0e38


def _w4a8_2l_gemv_argmax_kernel(
    x_ref, xs_ref, wp_ref, m_ref, sc_ref, val_ref, idx_ref, acc_ref,
    *, n_groups: int, group: int, n_total: int, bn: int,
):
    # Paired two-level GEMV with a fused greedy-decode epilogue: instead of
    # writing the (bm, N) fp32 logits to HBM and running a separate XLA
    # argmax over the 128k-vocab axis (measured ~0.9 ms/step at batch 8 for
    # the argmax alone, plus the logits round-trip), reduce each N panel to
    # a per-row running (max, argmax) carried in the revisited (bm, 1)
    # output blocks. Tie-breaking matches `jnp.argmax` exactly: first
    # occurrence wins (in-panel min-index over equal maxima; strict `>`
    # across panels scanning left to right).
    j = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for p in range(n_groups // 2):
        p32 = pltpu.bitcast(wp_ref[p * group:(p + 1) * group, :], jnp.int32)
        m_lo = m_ref[2 * p, 0, :].reshape(1, -1)
        m_hi = m_ref[2 * p + 1, 0, :].reshape(1, -1)
        lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
        hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
        w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
        w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
        acc_ref[:] += jax.lax.dot(
            x_ref[:, 2 * p * group:(2 * p + 1) * group], w_lo,
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += jax.lax.dot(
            x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], w_hi,
            preferred_element_type=jnp.int32,
        )
    out = acc_ref[:].astype(jnp.float32) * sc_ref[:] * xs_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) + j * bn
    # Mask the ragged tail of the last panel (N % bn != 0 for 128256/512):
    # Pallas-padded lanes hold undefined values that must never win.
    out = jnp.where(col < n_total, out, _NEG_BIG)
    pm = jnp.max(out, axis=1, keepdims=True)
    # NaN guard: a NaN logit makes `out == pm` false on every lane, which
    # would yield the out-of-vocab index n_total. Count NaN lanes as hits so
    # the returned index is always in-vocab (within a panel this matches
    # jnp.argmax's first-NaN-wins; NaN logits are otherwise out of contract
    # for the fused head — greedy decode on NaN logits is already garbage).
    hit = (out == pm) | jnp.isnan(out)
    pidx = jnp.min(
        jnp.where(hit, col, jnp.int32(n_total)), axis=1, keepdims=True
    )

    @pl.when(j == 0)
    def _init():
        val_ref[:] = pm
        idx_ref[:] = pidx

    @pl.when(j > 0)
    def _update():
        better = pm > val_ref[:]
        val_ref[:] = jnp.where(better, pm, val_ref[:])
        idx_ref[:] = jnp.where(better, pidx, idx_ref[:])


def matmul_w4a8_2l_gemv_argmax(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    mult: jax.Array,
    s_col: jax.Array,
    group_size: int = 128,
    block_n: int = 512,
    paired: Optional[bool] = None,
) -> jax.Array:
    """Greedy-decode lm_head: fused two-level W4A8 GEMV + row argmax.

    Returns the int32 argmax index over the N (vocab) axis per row of
    ``x_q`` — the full logits never leave VMEM. Bit-identical token choice
    to ``jnp.argmax(matmul_w4a8_2l_gemv(...), axis=-1)`` (fp32 epilogue in
    both paths, first-occurrence tie-breaking).
    """
    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    if paired is None:
        paired = flags.default_paired_layout() and n_groups % 2 == 0
    if not _on_tpu() or not paired:
        logits = matmul_w4a8_2l_reference(
            x_q, x_scale, w_packed, mult, s_col, None, group_size,
            jnp.float32, paired=paired,
        ) if not _on_tpu() else matmul_w4a8_2l_gemv(
            x_q, x_scale, w_packed, mult, s_col, group_size,
            jnp.float32, block_n, paired=paired,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    bm = max(8, M)
    if M < 8:
        x_q = jnp.pad(x_q, ((0, 8 - M), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, 8 - M))
    bn = _round_block(block_n, 128, N)
    val, idx = pl.pallas_call(
        functools.partial(
            _w4a8_2l_gemv_argmax_kernel,
            n_groups=n_groups, group=group_size, n_total=N, bn=bn,
        ),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 1, bn), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
            jax.ShapeDtypeStruct((bm, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * 8,
            transcendentals=0,
        ),
    )(x_q, x_scale.reshape(bm, 1).astype(jnp.float32), w_packed,
      mult.astype(jnp.int32).reshape(n_groups, 1, N),
      s_col.astype(jnp.float32).reshape(1, N))
    del val
    return idx[:M, 0]


def _w4a8_2l_gemv_stacked_body_concat(
    x_ref, wp_ref, m_ref, acc_ref, *, n_groups: int, group: int,
    concat_pairs: int,
):
    # Concat-pairs variant: SWAR-fold `concat_pairs` adjacent pair blocks,
    # concatenate the folded planes along K (the groups are K-adjacent) and
    # issue ONE MXU dot over 2*concat_pairs*group rows — fewer, longer dots
    # amortize the per-dot pipeline fill at decode-sized M.
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for c in range(n_groups // 2 // concat_pairs):
        planes = []
        for q in range(concat_pairs):
            p = c * concat_pairs + q
            p32 = pltpu.bitcast(
                wp_ref[0, p * group:(p + 1) * group, :], jnp.int32
            )
            word = m_ref[0, (2 * p) // 8, :].reshape(1, -1)
            m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
            m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
            lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
            hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
            planes.append(pltpu.bitcast(
                (lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8
            ))
            planes.append(pltpu.bitcast(
                (hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8
            ))
        w = jnp.concatenate(planes, axis=0)
        k0 = 2 * c * concat_pairs * group
        acc_ref[:] += jax.lax.dot(
            x_ref[:, k0:k0 + 2 * concat_pairs * group], w,
            preferred_element_type=jnp.int32,
        )


def _w4a8_2l_gemv_stacked_kernel(
    l_ref, x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref, acc_ref,
    *, n_groups: int, group: int,
):
    # Layer-indexed variant of `_w4a8_2l_gemv_kernel_paired`: operand refs
    # carry a leading singleton layer dim selected by the scalar-prefetch
    # index maps (l_ref). Same SWAR fold and dot structure. Multipliers
    # arrive nibble-packed 8-per-i32 (`pack_mult_nibbles`) — two static
    # shifts + ands per pair on a (1, bn) vector recover them; this keeps
    # the mult operand 8× smaller so XLA never decides to re-stage the
    # whole stacked array into scoped memory each layer step.
    #
    # The per-pair dots accumulate in a register VALUE (not acc_ref[:] +=):
    # a single memory-carried accumulator chains every dot behind the
    # previous one AND the preceding VPU fold — keeping the partial sums as
    # two independent values lets Mosaic overlap pair p+1's fold with pair
    # p's MXU dots.
    skipfold = flags.two_level_skipfold()
    skipdot = flags.two_level_skipdot()
    concat_pairs = flags.two_level_concat_pairs()
    if concat_pairs > 1 and not skipfold and not skipdot:
        _w4a8_2l_gemv_stacked_body_concat(
            x_ref, wp_ref, m_ref, acc_ref, n_groups=n_groups, group=group,
            concat_pairs=concat_pairs,
        )
        out_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sc_ref[0] * xs_ref[:]
        ).astype(out_ref.dtype)
        return
    acc_lo = jnp.zeros_like(acc_ref)
    acc_hi = jnp.zeros_like(acc_ref)
    for p in range(n_groups // 2):
        if skipdot and p > 0:
            # DIAGNOSTIC: touch the block (keeps the DMA) without folding
            # or dotting — measures the pure-DMA ceiling of this pipeline.
            acc_lo = acc_lo + wp_ref[0, p * group:p * group + 8, :8].astype(
                jnp.int32
            ).sum()
            continue
        p32 = pltpu.bitcast(wp_ref[0, p * group:(p + 1) * group, :], jnp.int32)
        word = m_ref[0, (2 * p) // 8, :].reshape(1, -1)
        m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
        m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
        if skipfold:  # DIAGNOSTIC: dot raw packed bytes (wrong numerics)
            w_lo = pltpu.bitcast(p32, jnp.int8)
            w_hi = pltpu.bitcast(p32 ^ 0x0F0F0F0F, jnp.int8)
        else:
            lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
            hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
            w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
            w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
        acc_lo = acc_lo + jax.lax.dot(
            x_ref[:, 2 * p * group:(2 * p + 1) * group], w_lo,
            preferred_element_type=jnp.int32,
        )
        acc_hi = acc_hi + jax.lax.dot(
            x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], w_hi,
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        (acc_lo + acc_hi).astype(jnp.float32) * sc_ref[0] * xs_ref[:]
    ).astype(out_ref.dtype)


def _w4a8_2l_gemv_stacked_manual_kernel(
    l_ref,            # scalar prefetch (1,) int32 — layer id
    x_ref, xs_ref,    # VMEM (bm, K) int8, (bm, 1) f32
    w_hbm,            # (L, NB, Kh, bn) int8 preblocked — stays in HBM
    m_ref, sc_ref,    # auto-pipelined (1, n_pack, bn) i32, (1, 1, bn) f32
    out_ref,          # (bm, bn)
    wbuf,             # scratch (nbuf, Kh, bn) int8 — persists across steps
    sems,             # DMA semaphores (nbuf,)
    *, n_groups: int, group: int, nbuf: int, n_panels: int,
):
    """Manual multi-buffered weight stream for the stacked 2L GEMV.

    The grid auto-pipeline double-buffers the weight panel and measured a
    537 GB/s ceiling vs ~930 sequential-read (docs/performance.md r2);
    `pl.Buffered` (deeper auto buffering) dies in lowering on this
    toolchain. This kernel DMAs the preblocked contiguous panels itself
    with ``nbuf`` scratch slots: at step j it starts panel j+nbuf-1 into
    the slot freed at step j-1, then waits panel j — up to nbuf-1 panels
    in flight during every compute step, across the whole grid (the
    scratch-persistence pattern proven by the ragged xseq kernel).
    """
    j = pl.program_id(0)
    layer = l_ref[0]

    def cp(slot, panel):
        return pltpu.make_async_copy(
            w_hbm.at[layer, panel], wbuf.at[slot], sems.at[slot]
        )

    @pl.when(j == 0)
    def _warmup():
        for b in range(nbuf - 1):
            if b < n_panels:
                cp(b % nbuf, b).start()

    nxt = j + nbuf - 1

    @pl.when(nxt < n_panels)
    def _prefetch():
        cp(jax.lax.rem(nxt, nbuf), nxt).start()

    cp(jax.lax.rem(j, nbuf), j).wait()
    slot = jax.lax.rem(j, nbuf)

    acc_lo = jnp.zeros(out_ref.shape, jnp.int32)
    acc_hi = jnp.zeros(out_ref.shape, jnp.int32)
    for p in range(n_groups // 2):
        p32 = pltpu.bitcast(
            wbuf[slot, p * group:(p + 1) * group, :], jnp.int32
        )
        word = m_ref[0, (2 * p) // 8, :].reshape(1, -1)
        m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
        m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
        lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
        hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
        w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
        w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
        acc_lo = acc_lo + jax.lax.dot(
            x_ref[:, 2 * p * group:(2 * p + 1) * group], w_lo,
            preferred_element_type=jnp.int32,
        )
        acc_hi = acc_hi + jax.lax.dot(
            x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], w_hi,
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        (acc_lo + acc_hi).astype(jnp.float32) * sc_ref[0] * xs_ref[:]
    ).astype(out_ref.dtype)


def _w4a8_2l_gemv_stacked_kernel_dotraw(
    l_ref, x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref, acc_ref,
    *, n_groups: int, group: int,
):
    # Dot-raw-nibbles variant: instead of SWAR-folding the multiplier into
    # the int8 weights before the dot (a serial and→mul→add→xor chain of
    # wide i32 ops per pair on the (group/4, bn) word tile), dot the plain
    # sign-restored nibbles (and + add + xor per plane: (u+0x78)^0x80 per
    # byte = u-8 two's-complement, borrow-free since u+0x78 <= 135) and
    # apply the group multiplier on the tiny (bm, bn) int32 accumulator:
    # acc += m_g * dot(x_g, u_g - 8). Exactly equal in int32
    # (v = (u-8)*m_g), drops the two wide SWAR multiplies per pair and
    # shortens the dependency chain in front of each MXU dot.
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for p in range(n_groups // 2):
        p32 = pltpu.bitcast(wp_ref[0, p * group:(p + 1) * group, :], jnp.int32)
        word = m_ref[0, (2 * p) // 8, :].reshape(1, -1)
        m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
        m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
        v_lo = pltpu.bitcast(
            (jnp.bitwise_and(p32, 0x0F0F0F0F) + 0x78787878) ^ _B0x80, jnp.int8
        )
        v_hi = pltpu.bitcast(
            (jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) + 0x78787878) ^ _B0x80,
            jnp.int8,
        )
        d_lo = jax.lax.dot(
            x_ref[:, 2 * p * group:(2 * p + 1) * group], v_lo,
            preferred_element_type=jnp.int32,
        )
        d_hi = jax.lax.dot(
            x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], v_hi,
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += m_lo * d_lo + m_hi * d_hi
    out_ref[:] = (
        acc_ref[:].astype(jnp.float32) * sc_ref[0] * xs_ref[:]
    ).astype(out_ref.dtype)


def _w4a8_2l_gemv_stacked_kernel_splitw(
    l_ref, x_ref, xs_ref, wp1_ref, wp2_ref, m_ref, sc_ref, out_ref, acc_ref,
    *, n_groups: int, group: int,
):
    # Same math as `_w4a8_2l_gemv_stacked_kernel`, but the weight panel
    # arrives as TWO half-K blocks (disjoint row ranges of the same stacked
    # array) — two concurrent DMA streams per grid step, probing whether a
    # single stream is issue-limited.
    acc = jnp.zeros_like(acc_ref)
    half_pairs = n_groups // 4
    for idx, wp in ((0, wp1_ref), (1, wp2_ref)):
        for q in range(half_pairs):
            p = idx * half_pairs + q
            p32 = pltpu.bitcast(wp[0, q * group:(q + 1) * group, :], jnp.int32)
            word = m_ref[0, (2 * p) // 8, :].reshape(1, -1)
            m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
            m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
            lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
            hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
            w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
            w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
            acc = acc + jax.lax.dot(
                x_ref[:, 2 * p * group:(2 * p + 1) * group], w_lo,
                preferred_element_type=jnp.int32,
            )
            acc = acc + jax.lax.dot(
                x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group], w_hi,
                preferred_element_type=jnp.int32,
            )
    out_ref[:] = (
        acc.astype(jnp.float32) * sc_ref[0] * xs_ref[:]
    ).astype(out_ref.dtype)


def matmul_w4a8_2l_gemv_stacked(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    mult: jax.Array,
    s_col: jax.Array,
    layer: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
) -> jax.Array:
    """Two-level W4A8 decode GEMV over *stacked* per-layer weights.

    ``w_packed`` (L, K//2, N) in the paired offset-binary layout, ``mult``
    nibble-packed (L, ceil(n_groups/8), N) int32 (`pack_mult_nibbles`),
    ``s_col`` (L, N); ``layer`` is a traced scalar int32. The layer index is
    routed through Pallas scalar prefetch into the BlockSpec index maps, so
    the DMA engine reads weight panels straight from the stacked array —
    under `lax.scan` over layers this avoids the per-layer dynamic-slice
    materialization XLA otherwise inserts before a custom call (measured
    ~5.2 ms/step of pure copies on the 8B decode loop, vs ~3.9 ms/step for
    the GEMVs themselves).

    Kernel-level parity with `matmul_w4a8_2l_gemv(paired=True)`; bit-exact
    vs `matmul_w4a8_2l_reference` on the selected layer.
    """
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K = x_q.shape
    # Pre-blocked at-rest layout (`preblock_stacked`): (L, N//bn, K//2, bn) —
    # every grid step's weight block is ONE contiguous HBM chunk instead of
    # K//2 strided rows of the (L, K//2, N) layout.
    preblocked = w_packed.ndim == 4
    if preblocked:
        L, NB, Kh, bnw = w_packed.shape
        N = NB * bnw
    else:
        L, Kh, N = w_packed.shape
    n_groups = K // group_size
    n_pack = mult.shape[1]
    if not _on_tpu():
        wl = jax.lax.dynamic_index_in_dim(w_packed, layer, keepdims=False)
        if preblocked:
            wl = wl.transpose(1, 0, 2).reshape(Kh, N)
        ml = unpack_mult_nibbles(
            jax.lax.dynamic_index_in_dim(mult, layer, keepdims=False), n_groups
        )
        sl = jax.lax.dynamic_index_in_dim(s_col, layer, keepdims=False)
        return matmul_w4a8_2l_reference(
            x_q, x_scale, wl, ml, sl, None, group_size, out_dtype, paired=True,
        )
    bm = max(8, M)
    if M < 8:
        x_q = jnp.pad(x_q, ((0, 8 - M), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, 8 - M))
    if block_n is None:  # env knob is a default, never an override
        block_n = flags.two_level_block_n()
    bn = bnw if preblocked else _round_block(block_n, 128, N)
    manual_bufs = flags.two_level_manual_bufs()
    if manual_bufs >= 2 and preblocked:
        n_panels = N // bn
        nbuf = min(manual_bufs, n_panels,
                   max(2, (6 << 20) // max(1, Kh * bn)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_panels,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda j, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda j, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, Kh, bn), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _w4a8_2l_gemv_stacked_manual_kernel,
                n_groups=n_groups, group=group_size,
                nbuf=nbuf, n_panels=n_panels,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bm * N * K,
                bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
                transcendentals=0,
            ),
        )(jnp.reshape(layer, (1,)).astype(jnp.int32),
          x_q, x_scale.reshape(bm, 1).astype(jnp.float32),
          w_packed, mult,
          s_col.astype(jnp.float32).reshape(L, 1, N))
        return out[:M]
    nbuf = flags.two_level_buffers()
    # cap buffers so the weight operand stays within ~8 MB of VMEM
    nbuf = max(2, min(nbuf, (8 << 20) // max(1, Kh * bn)))
    pipe = (
        pl.Buffered(buffer_count=nbuf, use_lookahead=flags.two_level_lookahead())
        if (nbuf > 2 or flags.two_level_lookahead()) else None
    )
    if preblocked:
        w_spec = pl.BlockSpec((1, 1, Kh, bn), lambda j, l: (l[0], j, 0, 0),
                              memory_space=pltpu.VMEM, pipeline_mode=pipe)
    else:
        w_spec = pl.BlockSpec((1, Kh, bn), lambda j, l: (l[0], 0, j),
                              memory_space=pltpu.VMEM, pipeline_mode=pipe)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )
    splitw = (
        flags.two_level_split_w() and not preblocked
        and n_groups % 4 == 0 and Kh % 2 == 0
    )
    if splitw:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(N, bn),),
            in_specs=[
                pl.BlockSpec((bm, K), lambda j, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda j, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kh // 2, bn), lambda j, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kh // 2, bn), lambda j, l: (l[0], 1, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        )
        out = pl.pallas_call(
            functools.partial(
                _w4a8_2l_gemv_stacked_kernel_splitw,
                n_groups=n_groups, group=group_size,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bm * N * K,
                bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
                transcendentals=0,
            ),
        )(jnp.reshape(layer, (1,)).astype(jnp.int32),
          x_q, x_scale.reshape(bm, 1).astype(jnp.float32),
          w_packed, w_packed, mult,
          s_col.astype(jnp.float32).reshape(L, 1, N))
        return out[:M]
    body = functools.partial(
        _w4a8_2l_gemv_stacked_kernel_dotraw
        if flags.two_level_dotraw()
        else _w4a8_2l_gemv_stacked_kernel,
        n_groups=n_groups, group=group_size,
    )
    if preblocked:
        def kernel(l_ref, x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref, acc_ref):
            body(l_ref, x_ref, xs_ref, wp_ref.at[:, 0], m_ref, sc_ref,
                 out_ref, acc_ref)
    else:
        kernel = body
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel"
                if flags.two_level_pargrid()
                else "arbitrary",
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_q, x_scale.reshape(bm, 1).astype(jnp.float32), w_packed,
      mult,
      s_col.astype(jnp.float32).reshape(L, 1, N))
    return out[:M]


def preblock_stacked(w_packed: jax.Array, block_n: int) -> jax.Array:
    """Reshape stacked packed weights (L, K//2, N) → (L, N//bn, K//2, bn).

    The GEMV grid walks N panels; in the (L, K//2, N) layout each panel
    block is K//2 strided rows, in this layout it is one contiguous chunk —
    the DMA-structure experiment behind `matmul_w4a8_2l_gemv_stacked`'s
    4-D path. Requires N % block_n == 0.
    """
    L, Kh, N = w_packed.shape
    if N % block_n:
        raise ValueError(f"N={N} not divisible by block_n={block_n}")
    return jnp.transpose(
        w_packed.reshape(L, Kh, N // block_n, block_n), (0, 2, 1, 3)
    )


# =============================================================================
# Two-level W4A4 (decode): int4 activations x int4 weights on the MXU
# =============================================================================
#
# The W4A8 GEMV at batch >= 128 is MXU-compute-bound (docs/performance.md
# "GEMV loop at large batch"); the FLOP lever is lower-bit activations.
# Probed on v5e (`scripts/tpu_probe_int4.py`): int4 x int4 `lax.dot`
# measures 340 TOP/s vs 240 for int8 in the same harness (x1.41), and
# `pltpu.bitcast(int8, int4)` emits the (lo, hi) nibbles of byte row r as
# int4 rows 2r, 2r+1 — so with the *vertical* at-rest packing
# (`pack_int4_vertical`) a weight panel becomes MXU-ready int4 with ONE
# bitcast and zero nibble arithmetic.
#
# Two-level scales work differently from the W4A8 kernels: the per-group
# integer multiplier m cannot fold into int4 weights (|v4 * m| overflows the
# nibble), so it is applied on the (bm, bn) int32 accumulator instead —
# acc += m_g * dot4(x4_g, v4_g) — the `dotraw` structure, which measured
# as noise vs in-weight folding at int8 (docs/performance.md r4).
#
# Activations: symmetric per-row int4 (`quantize_rowwise_a4`), stored as
# int8 in [-8, 7] and converted with one in-kernel astype. Accuracy is
# measured in docs/accuracy.md — A4 is a throughput/quality trade the
# simulation tier can predict per-model (reference bitwidth machinery:
# `_quantizer_impl.py:45-75`).


def quantize_rowwise_a4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int4 quantization: (x_q int8 in [-8, 7], scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -8, 7)
    return x_q.astype(jnp.int8), scale


def convert_two_level_a4(
    w_packed: jax.Array, w_scale: jax.Array, group_size: int = 128,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Requantize float-per-group W4 onto the two-level grid, vertical layout.

    Same progressive-quantization math as `convert_two_level` (m in [1, 15]
    int, effective group scale = m * s_col exactly), but the at-rest nibble
    layout is `pack_int4_vertical` — the W4A4 kernel's bitcast-ready format.
    Returns ``(packed_v, mult, s_col)``.
    """
    n_groups, N = w_scale.shape
    K = w_packed.shape[0] * 2
    g = group_size
    s = w_scale.astype(jnp.float32)
    s_col = jnp.maximum(jnp.max(s, axis=0) / 15.0, 1e-12)
    m = jnp.clip(jnp.round(s / s_col[None, :]), 1, 15)
    s_eff = m * s_col[None, :]
    v = unpack_int4(w_packed, g).astype(jnp.float32).reshape(n_groups, g, N)
    w = v * s[:, None, :]
    v2 = jnp.clip(jnp.round(w / s_eff[:, None, :]), -8, 7).astype(jnp.int8)
    return (
        pack_int4_vertical(v2.reshape(K, N)),
        m.astype(jnp.int8),
        s_col,
    )


def matmul_w4a4_2l_reference(
    x_q: jax.Array, x_scale: jax.Array, w_packed: jax.Array, mult: jax.Array,
    s_col: jax.Array, bias: Optional[jax.Array] = None, group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Oracle for the W4A4 GEMV: integer math end-to-end, one fp scaling.

    ``x_q`` int4-valued int8 (M, K); ``w_packed`` vertical layout (K//2, N).
    """
    from fastforward_tpu.kernels.packing import unpack_int4_vertical

    M, K = x_q.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    v = unpack_int4_vertical(w_packed).reshape(n_groups, group_size, N)
    w8 = (v.astype(jnp.int32) * mult.astype(jnp.int32)[:, None, :]).reshape(K, N)
    acc = jax.lax.dot(
        x_q.astype(jnp.int32), w8, preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * s_col[None, :] * x_scale[:, None]
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def _w4a4_2l_gemv_stacked_kernel(
    l_ref, x_ref, xs_ref, wp_ref, m_ref, sc_ref, out_ref,
    *, n_groups: int, group: int,
):
    # One int4 dot per group; the group multiplier lands on the int32
    # accumulator (see section comment). Two alternating register
    # accumulators decouple consecutive dots' dependency chains (the
    # pattern measured in `_w4a8_2l_gemv_stacked_kernel`).
    half = group // 2
    nomul = flags.a4_nomul()
    concat_groups = flags.a4_concat()
    x4 = x_ref[:].astype(jnp.int4)
    acc_even = jnp.zeros(out_ref.shape, jnp.int32)
    acc_odd = jnp.zeros(out_ref.shape, jnp.int32)
    if concat_groups > 1:
        # DIAGNOSTIC (FF_A4_CONCAT>1, wrong numerics): one long dot per
        # concat block, first group's multiplier applied to the whole block
        # — measures the dot-issue ceiling with concat_groups-times longer
        # dots. A correct concat needs a format change (uniform m per
        # block); this pins whether that change would pay first.
        for c in range(n_groups // concat_groups):
            planes = [
                pltpu.bitcast(
                    wp_ref[0, (c * concat_groups + q) * half:
                           (c * concat_groups + q + 1) * half, :], jnp.int4
                )
                for q in range(concat_groups)
            ]
            w4 = jnp.concatenate(planes, axis=0)
            d = jax.lax.dot(
                x4[:, c * concat_groups * group:(c + 1) * concat_groups * group],
                w4, preferred_element_type=jnp.int32,
            )
            word = m_ref[0, (c * concat_groups) // 8, :].reshape(1, -1)
            m_g = jnp.bitwise_and(word >> (4 * ((c * concat_groups) % 8)), 0xF)
            if c % 2 == 0:
                acc_even = acc_even + m_g * d
            else:
                acc_odd = acc_odd + m_g * d
    else:
        for g_i in range(n_groups):
            w4 = pltpu.bitcast(
                wp_ref[0, g_i * half:(g_i + 1) * half, :], jnp.int4
            )
            d = jax.lax.dot(
                x4[:, g_i * group:(g_i + 1) * group], w4,
                preferred_element_type=jnp.int32,
            )
            if nomul:
                # DIAGNOSTIC (FF_A4_NOMUL, wrong numerics): isolates the
                # VPU cost of the per-group accumulator multiply.
                m_g = 1
            else:
                word = m_ref[0, g_i // 8, :].reshape(1, -1)
                m_g = jnp.bitwise_and(word >> (4 * (g_i % 8)), 0xF)
            if g_i % 2 == 0:
                acc_even = acc_even + m_g * d
            else:
                acc_odd = acc_odd + m_g * d
    out_ref[:] = (
        (acc_even + acc_odd).astype(jnp.float32) * sc_ref[0] * xs_ref[:]
    ).astype(out_ref.dtype)


def matmul_w4a4_2l_gemv_stacked(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    mult: jax.Array,
    s_col: jax.Array,
    layer: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
) -> jax.Array:
    """W4A4 decode GEMV over stacked per-layer weights (vertical layout).

    ``x_q`` int4-valued int8 (M, K) (`quantize_rowwise_a4`); ``w_packed``
    (L, K//2, N) `pack_int4_vertical`; ``mult`` nibble-packed
    (L, ceil(n_groups/8), N) int32 (`pack_mult_nibbles`); ``s_col`` (L, N).
    Layer index rides scalar prefetch exactly like
    `matmul_w4a8_2l_gemv_stacked`. Bit-exact vs `matmul_w4a4_2l_reference`
    on the selected layer.
    """
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K = x_q.shape
    L, Kh, N = w_packed.shape
    n_groups = K // group_size
    n_pack = mult.shape[1]
    if not _on_tpu():
        wl = jax.lax.dynamic_index_in_dim(w_packed, layer, keepdims=False)
        ml = unpack_mult_nibbles(
            jax.lax.dynamic_index_in_dim(mult, layer, keepdims=False), n_groups
        )
        sl = jax.lax.dynamic_index_in_dim(s_col, layer, keepdims=False)
        return matmul_w4a4_2l_reference(
            x_q, x_scale, wl, ml, sl, None, group_size, out_dtype,
        )
    bm = max(8, M)
    if M < 8:
        x_q = jnp.pad(x_q, ((0, 8 - M), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, 8 - M))
    if block_n is None:
        block_n = flags.two_level_block_n()
    bn = _round_block(block_n, 128, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kh, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _w4a4_2l_gemv_stacked_kernel, n_groups=n_groups, group=group_size,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_q, x_scale.reshape(bm, 1).astype(jnp.float32), w_packed,
      mult,
      s_col.astype(jnp.float32).reshape(L, 1, N))
    return out[:M]


def matmul_w4a4_2l_gemv(
    x_q: jax.Array,
    x_scale: jax.Array,
    w_packed: jax.Array,
    mult: jax.Array,
    s_col: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    block_n: int = 512,
) -> jax.Array:
    """Non-stacked W4A4 decode GEMV: wraps the stacked kernel with L=1."""
    from fastforward_tpu.kernels.packing import pack_mult_nibbles

    if not _on_tpu():
        return matmul_w4a4_2l_reference(
            x_q, x_scale, w_packed, mult, s_col, None, group_size, out_dtype,
        )
    return matmul_w4a4_2l_gemv_stacked(
        x_q, x_scale, w_packed[None], pack_mult_nibbles(mult)[None],
        s_col[None], jnp.asarray(0, jnp.int32), group_size, out_dtype,
        block_n,
    )


def dequantize_int4_vertical(
    w_packed: jax.Array, s_eff: jax.Array, group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Dequantize vertical-layout packed weights to dense (prefill path).

    Pure XLA: the W4A4 prefill runs activations in bf16 (one dequant per
    layer per chunk, full-rate MXU matmul — exactly the W4A8 prefill
    policy; A4 is a decode-GEMV trade).
    """
    from fastforward_tpu.kernels.packing import unpack_int4_vertical

    K = w_packed.shape[0] * 2
    N = w_packed.shape[1]
    v = unpack_int4_vertical(w_packed).reshape(K // group_size, group_size, N)
    w = v.astype(jnp.float32) * s_eff[:, None, :].astype(jnp.float32)
    return w.reshape(K, N).astype(out_dtype)


# =============================================================================
# Pallas int4 → bf16 dequantization (prefill path)
# =============================================================================


def _dequant_int4_kernel(wp_ref, ws_ref, out_ref, *, half: int, offset_binary: bool):
    p32 = pltpu.bitcast(wp_ref[:], jnp.int32)
    lo32 = jnp.bitwise_and(p32, 0x0F0F0F0F)
    hi32 = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F)
    if not offset_binary:  # two's-complement nibbles: map to u = v+8 first
        lo32 = lo32 ^ 0x08080808
        hi32 = hi32 ^ 0x08080808
    low = pltpu.bitcast(lo32, jnp.int8)
    high = pltpu.bitcast(hi32, jnp.int8)
    s = ws_ref[0].astype(jnp.bfloat16)
    out_ref[0:half, :] = (low.astype(jnp.bfloat16) - 8.0) * s
    out_ref[half:, :] = (high.astype(jnp.bfloat16) - 8.0) * s


def _dequant_int4_paired_kernel(wp_ref, ws_ref, out_ref, *, group: int):
    # Paired layout: one pair block (group packed rows) → two full groups;
    # each nibble plane gets its own group scale.
    p32 = pltpu.bitcast(wp_ref[:], jnp.int32)
    low = pltpu.bitcast(jnp.bitwise_and(p32, 0x0F0F0F0F), jnp.int8)
    high = pltpu.bitcast(jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F), jnp.int8)
    s_lo = ws_ref[0].astype(jnp.bfloat16)
    s_hi = ws_ref[1].astype(jnp.bfloat16)
    out_ref[0:group, :] = (low.astype(jnp.bfloat16) - 8.0) * s_lo
    out_ref[group:, :] = (high.astype(jnp.bfloat16) - 8.0) * s_hi


def dequantize_int4(
    w_packed: jax.Array, w_scale: jax.Array, group_size: int = 128,
    block_n: int = 512, offset_binary: bool = False, paired: bool = False,
) -> jax.Array:
    """Unpack + scale packed-int4 weights to a dense bf16 (K, N) array.

    One VMEM pass (≈2.5 VPU ops/elem) — ~20x faster than XLA's elementwise
    unpack chain on this toolchain. The prefill path uses this once per
    weight use and feeds XLA's full-rate bf16 matmul. ``offset_binary``
    selects the `pack_uint4_offset` at-rest layout (two-level mode);
    ``paired`` the adjacent-group pairing (`pack_uint4_offset_paired` —
    implies offset-binary nibbles).
    """
    K2, N = w_packed.shape
    K = K2 * 2
    n_groups = K // group_size
    half = group_size // 2
    if not _on_tpu():
        if paired:
            unpack = unpack_uint4_offset_paired
        else:
            unpack = unpack_uint4_offset if offset_binary else unpack_int4
        v = unpack(w_packed, group_size).astype(jnp.float32)
        v = v.reshape(n_groups, group_size, N) * w_scale.astype(jnp.float32)[:, None, :]
        return v.reshape(K, N).astype(jnp.bfloat16)
    bn = _round_block(block_n, 128, N)
    ws = w_scale.astype(jnp.float32).reshape(n_groups, 1, N)
    if paired:
        # Paired layout: unpaired output rows come back in (lo-group,
        # hi-group) order per pair, which IS the original row order.
        return pl.pallas_call(
            functools.partial(_dequant_int4_paired_kernel, group=group_size),
            grid=(n_groups // 2, pl.cdiv(N, bn)),
            in_specs=[
                pl.BlockSpec(
                    (group_size, bn), lambda g, j: (g, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, 1, bn), lambda g, j: (g, 0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (2 * group_size, bn), lambda g, j: (g, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            cost_estimate=pl.CostEstimate(
                flops=K * N, bytes_accessed=K * N // 2 + K * N * 2,
                transcendentals=0,
            ),
        )(w_packed, ws)
    return pl.pallas_call(
        functools.partial(
            _dequant_int4_kernel, half=half, offset_binary=offset_binary
        ),
        grid=(n_groups, pl.cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((half, bn), lambda g, j: (g, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda g, j: (g, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group_size, bn), lambda g, j: (g, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * N, bytes_accessed=K * N // 2 + K * N * 2, transcendentals=0
        ),
    )(w_packed, ws)


def _dequant_int4_paired_stacked_kernel(l_ref, wp_ref, m_ref, sc_ref, out_ref, *, group: int):
    # Layer-indexed paired dequant: effective per-group scale mult * s_col is
    # formed in-kernel from the (1, 2, bn) multiplier block and the (1, 1, bn)
    # column scale, so no per-layer s_eff array ever exists. The weight block
    # is (1, group, bn) for the flat layout or (1, 1, group, bn) pre-blocked.
    w_block = wp_ref[0] if wp_ref.ndim == 3 else wp_ref[0, 0]
    p32 = pltpu.bitcast(w_block, jnp.int32)
    low = pltpu.bitcast(jnp.bitwise_and(p32, 0x0F0F0F0F), jnp.int8)
    high = pltpu.bitcast(jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F), jnp.int8)
    sc = sc_ref[0, 0].astype(jnp.float32)
    s_lo = (m_ref[0, 0, 0].astype(jnp.float32) * sc).astype(jnp.bfloat16)
    s_hi = (m_ref[0, 1, 0].astype(jnp.float32) * sc).astype(jnp.bfloat16)
    out_ref[0:group, :] = (low.astype(jnp.bfloat16) - 8.0) * s_lo
    out_ref[group:, :] = (high.astype(jnp.bfloat16) - 8.0) * s_hi


def dequantize_int4_paired_stacked(
    w_packed: jax.Array,   # (L, K//2, N) paired offset-binary
    mult: jax.Array,       # (L, n_groups, N) int
    s_col: jax.Array,      # (L, N) f32
    layer: jax.Array,      # scalar int32
    group_size: int = 128,
    block_n: int = 512,
) -> jax.Array:
    """Dequantize layer ``layer`` of stacked two-level W4 weights to bf16.

    Prefill companion to `matmul_w4a8_2l_gemv_stacked`: the layer index rides
    scalar prefetch into the index maps, so prefill never materializes
    per-layer slices of the packed weights / multipliers / scales (the slice
    copies cost ~6.4 ms of the 51 ms device-side 8B batch-1 prefill —
    profiler-traced).
    """
    # Pre-blocked at-rest layout (`preblock_stacked`): (L, N//bn, K//2, bn).
    preblocked = w_packed.ndim == 4
    if preblocked:
        L, NB, K2, bnw = w_packed.shape
        N = NB * bnw
    else:
        L, K2, N = w_packed.shape
    K = K2 * 2
    n_groups = K // group_size
    if not _on_tpu():
        wl = jax.lax.dynamic_index_in_dim(w_packed, layer, keepdims=False)
        if preblocked:
            wl = wl.transpose(1, 0, 2).reshape(K2, N)
        ml = jax.lax.dynamic_index_in_dim(mult, layer, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(s_col, layer, keepdims=False)
        s_eff = ml.astype(jnp.float32) * sl[None, :]
        return dequantize_int4(
            wl, s_eff, group_size, offset_binary=True, paired=True
        )
    bn = bnw if preblocked else _round_block(block_n, 128, N)
    if preblocked:
        w_spec = pl.BlockSpec(
            (1, 1, group_size, bn), lambda g, j, l: (l[0], j, g, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        w_spec = pl.BlockSpec(
            (1, group_size, bn), lambda g, j, l: (l[0], g, j),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups // 2, pl.cdiv(N, bn)),
        in_specs=[
            w_spec,
            pl.BlockSpec((1, 2, 1, bn), lambda g, j, l: (l[0], g, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda g, j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * group_size, bn), lambda g, j, l: (g, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_dequant_int4_paired_stacked_kernel, group=group_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * N, bytes_accessed=K * N // 2 + K * N * 2, transcendentals=0
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      w_packed, mult.reshape(L, n_groups, 1, N),
      s_col.astype(jnp.float32).reshape(L, 1, N))


def _dequant_int4_vertical_stacked_kernel(
    l_ref, wp_ref, m_ref, sc_ref, out_ref,
):
    # Vertical-layout analog of `_dequant_int4_paired_stacked_kernel`: one
    # bitcast restores the group's rows in order (no nibble math at all).
    w4 = pltpu.bitcast(wp_ref[0], jnp.int4)
    s_eff = (
        m_ref[0, 0, 0].astype(jnp.float32) * sc_ref[0, 0].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    out_ref[:, :] = w4.astype(jnp.bfloat16) * s_eff


def dequantize_int4_vertical_stacked(
    w_packed: jax.Array,   # (L, K//2, N) vertical layout
    mult: jax.Array,       # (L, n_groups, N) int
    s_col: jax.Array,      # (L, N) f32
    layer: jax.Array,
    group_size: int = 512,
    block_n: int = 512,
) -> jax.Array:
    """Layer-indexed dequant of vertical-layout W4A4 weights to bf16.

    The W4A4 prefill companion of `dequantize_int4_paired_stacked`:
    without it, prefill-shaped `call_layer` fell to the generic per-layer
    slice fallback, which cost 2.3x TTFT at prompt 512 (362 vs 157 ms —
    measured via `scripts/ttft.py` before this kernel).
    """
    L, K2, N = w_packed.shape
    K = K2 * 2
    n_groups = K // group_size
    half = group_size // 2
    if not _on_tpu():
        wl = jax.lax.dynamic_index_in_dim(w_packed, layer, keepdims=False)
        ml = jax.lax.dynamic_index_in_dim(mult, layer, keepdims=False)
        sl = jax.lax.dynamic_index_in_dim(s_col, layer, keepdims=False)
        s_eff = ml.astype(jnp.float32) * sl[None, :]
        return dequantize_int4_vertical(wl, s_eff, group_size)
    bn = _round_block(block_n, 128, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, pl.cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((1, half, bn), lambda g, j, l: (l[0], g, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bn), lambda g, j, l: (l[0], g, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda g, j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group_size, bn), lambda g, j, l: (g, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _dequant_int4_vertical_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * N, bytes_accessed=K * N // 2 + K * N * 2,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      w_packed, mult.reshape(L, n_groups, 1, N),
      s_col.astype(jnp.float32).reshape(L, 1, N))


# =============================================================================
# W4A16: packed int4 per-group weights, bf16 activations (weight-only)
# =============================================================================


def matmul_w4a16_reference(
    x: jax.Array, w_packed: jax.Array, w_scale: jax.Array,
    bias: Optional[jax.Array] = None, group_size: int = 128, out_dtype=None,
) -> jax.Array:
    K = x.shape[-1]
    N = w_packed.shape[1]
    n_groups = K // group_size
    w = unpack_int4(w_packed, group_size).astype(jnp.float32)
    w = w.reshape(n_groups, group_size, N) * w_scale.astype(jnp.float32)[:, None, :]
    w = w.reshape(K, N).astype(x.dtype)
    out = x @ w
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype or x.dtype)


def _w4a16_kernel(x_ref, wp_ref, ws_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(wp_ref[:]).astype(jnp.bfloat16)
    w = w * ws_ref[0].astype(jnp.bfloat16)

    acc_ref[:] += jax.lax.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _epilogue():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def matmul_w4a16(
    x: jax.Array,
    w_packed: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    group_size: int = 128,
    out_dtype=None,
    block_m: int = 256,
    block_n: int = 512,
) -> jax.Array:
    """Weight-only INT4 per-group matmul: dequantize to bf16 in VMEM, MXU dot."""
    M, K = x.shape
    N = w_packed.shape[1]
    n_groups = K // group_size
    out_dtype = out_dtype or x.dtype
    if not _on_tpu():
        return matmul_w4a16_reference(x, w_packed, w_scale, bias, group_size, out_dtype)
    if M <= _GEMV_MAX_M:
        out = matmul_w4_gemv(x, w_packed, w_scale, group_size, out_dtype)
        if bias is not None:
            out = (out.astype(jnp.float32) + bias).astype(out_dtype)
        return out
    w = dequantize_int4(w_packed, w_scale, group_size)
    out = jax.lax.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)

    half = group_size // 2
    bm = _round_block(block_m, 8, max(M, 8))
    bn = _round_block(block_n, 128, N)
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_groups)
    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, n_k=n_groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, group_size), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, w_packed, w_scale.reshape(n_groups, 1, N))
    if bias is not None:
        out = (out.astype(jnp.float32) + bias).astype(out_dtype)
    return out


# =============================================================================
# Dynamic activation quantization (XLA — fuses into neighbors)
# =============================================================================


def quantize_rowwise(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization: returns (x_q int8, scale (M,) f32).

    Pure XLA on purpose: a single fused reduce+scale pass that XLA merges
    with the producer; a Pallas kernel would add nothing (bandwidth-bound,
    no reuse).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -128, 127)
    return x_q.astype(jnp.int8), scale


# =============================================================================
# Fused layer tail: o_proj + residual + norm + gate/up + SiLU + down + residual
# in ONE pallas_call (decode shape, stacked two-level W4A8 paired weights)
# =============================================================================
#
# Motivation (measured, docs/performance.md round 2): the decode layer body
# issues 4 separate GEMV pallas_calls with XLA glue between them; isolated
# single-call loops show a large per-call serial latency (qkv-only loop 178
# GB/s vs 481 for the full mix) — the DMA pipeline drains and the launch
# latency is paid at every boundary. Fusing the three post-attention
# matmuls into one grid keeps the weight stream running continuously and
# moves the norm/SiLU/requant glue into VPU work between phases.


def _pair_dot_acc(x_get, wp_block, m_row_get, n_pairs, group, acc):
    """Shared SWAR fold + dot loop over K pairs.

    x_get(k0, k1) → (bm, group) int8 activation slice;
    wp_block[rows, :] → packed weight rows; m_row_get(word_idx) → (1, bn)
    int32 packed-multiplier row. Returns the updated (bm, bn) int32 acc.
    """
    for p in range(n_pairs):
        p32 = pltpu.bitcast(wp_block[p * group:(p + 1) * group, :], jnp.int32)
        word = m_row_get((2 * p) // 8)
        m_lo = jnp.bitwise_and(word >> (4 * ((2 * p) % 8)), 0xF)
        m_hi = jnp.bitwise_and(word >> (4 * ((2 * p) % 8) + 4), 0xF)
        lo = jnp.bitwise_and(p32, 0x0F0F0F0F) * m_lo
        hi = jnp.bitwise_and(p32 >> 4, 0x0F0F0F0F) * m_hi
        w_lo = pltpu.bitcast((lo + (_B0x80 - m_lo * 0x08080808)) ^ _B0x80, jnp.int8)
        w_hi = pltpu.bitcast((hi + (_B0x80 - m_hi * 0x08080808)) ^ _B0x80, jnp.int8)
        acc = acc + jax.lax.dot(
            x_get(2 * p * group, (2 * p + 1) * group), w_lo,
            preferred_element_type=jnp.int32,
        )
        acc = acc + jax.lax.dot(
            x_get((2 * p + 1) * group, (2 * p + 2) * group), w_hi,
            preferred_element_type=jnp.int32,
        )
    return acc


def _rowwise_quant_int8(x_f32):
    """In-kernel dynamic symmetric int8 row quantization (match
    `quantize_rowwise`: clip [-128, 127], scale = amax/127)."""
    amax = jnp.max(jnp.abs(x_f32), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x_f32 / scale), -128, 127).astype(jnp.int8)
    return q, scale


def _fused_o_mlp_kernel(
    l_ref,
    xq_ref,     # (bm, K1) int8 — quantized attention output
    xs_ref,     # (bm, 1) f32
    res_ref,    # (n_o, bm, bn) f32 — residual, block-major
    nw_ref,     # (1, n_o, 1, bn) f32 — post-attn norm weight (layer block)
    ow_ref, om_ref, os_ref,     # o_proj blocks
    gw_ref, gm_ref, gs_ref,     # gateup blocks
    dw_ref, dm_ref, ds_ref,     # down blocks
    out_ref,    # (bm, bn) f32 — layer output block (dn phase)
    x1_ref,     # scratch (n_o, bm, bn) f32 — x + o_out, block-major
    hq_ref,     # scratch (n_o, bm, bn) int8 — quantized normed hidden
    hs_ref,     # scratch (bm, 128) f32 — its row scale
    gu_ref,     # scratch (n_gu, bm, bn) bf16 — gateup output, block-major
    x2_ref,     # scratch (n_gu//2, bm, bn) int8 — quantized gated act
    x2s_ref,    # scratch (bm, 128) f32
    *,
    n_o: int, n_gu: int, n_dn: int,
    g1: int, g2: int, group: int, bn: int, eps: float,
):
    # Scratch activations are BLOCK-MAJOR (blocks, bm, bn): Mosaic has no
    # dynamic lane slices, but dynamic indexing on an untiled leading dim
    # is fine — each phase writes x[j] and the K-slices the next phase's
    # dots read are static (group divides bn).
    j = pl.program_id(0)
    bm = xq_ref.shape[0]

    def k_slice(ref, a):
        # static K window [a, a+group) of a block-major activation scratch
        return ref[a // bn, :, a % bn:a % bn + group]

    @pl.when(j < n_o)
    def _o_phase():
        acc = jnp.zeros((bm, bn), jnp.int32)
        acc = _pair_dot_acc(
            lambda a, b: xq_ref[:, a:b], ow_ref.at[0],
            lambda w: om_ref[0, w, :].reshape(1, -1), g1 // 2, group, acc,
        )
        x1_ref[j] = res_ref[j] + acc.astype(jnp.float32) * os_ref[0] * xs_ref[:]

    @pl.when(j == n_o)
    def _norm_boundary():
        x1 = x1_ref[...]                                   # (n_o, bm, bn)
        # all intermediates stay >=2-D (Mosaic cannot relayout 1-D vectors)
        ssum = jnp.sum(jnp.sum(x1 * x1, axis=2, keepdims=True), axis=0,
                       keepdims=True)                      # (1, bm, 1)
        inv = jax.lax.rsqrt(ssum / (n_o * bn) + eps)
        h = x1 * inv * nw_ref[0]
        amax = jnp.max(jnp.max(jnp.abs(h), axis=2, keepdims=True), axis=0,
                       keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)
        hq_ref[...] = jnp.clip(jnp.round(h / s), -128, 127).astype(jnp.int8)
        hs_ref[...] = jnp.broadcast_to(s[0], hs_ref.shape)

    @pl.when((j >= n_o) & (j < n_o + n_gu))
    def _gu_phase():
        acc = jnp.zeros((bm, bn), jnp.int32)
        acc = _pair_dot_acc(
            lambda a, b: k_slice(hq_ref, a), gw_ref.at[0],
            lambda w: gm_ref[0, w, :].reshape(1, -1), g1 // 2, group, acc,
        )
        gu_ref[j - n_o] = (
            acc.astype(jnp.float32) * gs_ref[0] * hs_ref[:, :1]
        ).astype(jnp.bfloat16)

    @pl.when(j == n_o + n_gu)
    def _silu_boundary():
        half = n_gu // 2
        gate = gu_ref[0:half].astype(jnp.float32)          # (half, bm, bn)
        up = gu_ref[half:n_gu].astype(jnp.float32)
        gated = gate * (1.0 / (1.0 + jnp.exp(-gate))) * up
        amax = jnp.max(jnp.max(jnp.abs(gated), axis=2, keepdims=True), axis=0,
                       keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)
        x2_ref[...] = jnp.clip(
            jnp.round(gated / s), -128, 127
        ).astype(jnp.int8)
        x2s_ref[...] = jnp.broadcast_to(s[0], x2s_ref.shape)

    @pl.when(j >= n_o + n_gu)
    def _dn_phase():
        jj = j - n_o - n_gu
        acc = jnp.zeros((bm, bn), jnp.int32)
        acc = _pair_dot_acc(
            lambda a, b: k_slice(x2_ref, a), dw_ref.at[0],
            lambda w: dm_ref[0, w, :].reshape(1, -1), g2 // 2, group, acc,
        )
        out_ref[...] = (
            x1_ref[jj] + acc.astype(jnp.float32) * ds_ref[0] * x2s_ref[:, :1]
        )


def _fused_o_gu_kernel(
    l_ref,
    xq_ref,     # (bm, K1) int8 — quantized attention output
    xs_ref,     # (bm, 1) f32
    res_ref,    # (1, bm, bn) f32 — residual, block-major (one block)
    nw_ref,     # (1, n_o, 1, bn) f32 — post-attn norm weight (layer block)
    ow_ref, om_ref, os_ref,     # o_proj blocks
    gw_ref, gm_ref, gs_ref,     # gateup blocks
    x1_out_ref,  # (bm, bn) f32 — x + o_out block (o phase)
    gu_out_ref,  # (bm, bn) bf16 — gate/up output block (gu phase)
    x1_ref,      # scratch (n_o, bm, bn) f32
    hq_ref,      # scratch (n_o, bm, bn) int8 — quantized normed hidden
    hs_ref,      # scratch (bm, 128) f32
    *,
    n_o: int, n_gu: int, g1: int, group: int, bn: int, eps: float,
):
    """First half of the fused layer tail, VMEM-sized for LARGE batches.

    o_proj + residual + post-RMSNorm + dynamic int8 requant + gate/up in
    one pallas_call; the full tail kernel's dominant scratch (gate/up
    bf16, bm x 2 x inter bytes) becomes an OUTPUT streamed per block, so
    the o->gu call boundary + the norm/requant XLA glue disappear at any
    bm <= 256 — the full-tail kernel caps at bm 64 (VERDICT r3 weak #1).
    SiLU + requant + down stay outside (XLA glue + the down GEMV call).
    """
    j = pl.program_id(0)
    bm = xq_ref.shape[0]

    @pl.when(j < n_o)
    def _o_phase():
        acc = jnp.zeros((bm, bn), jnp.int32)
        acc = _pair_dot_acc(
            lambda a, b: xq_ref[:, a:b], ow_ref.at[0],
            lambda w: om_ref[0, w, :].reshape(1, -1), g1 // 2, group, acc,
        )
        x1 = res_ref[0] + acc.astype(jnp.float32) * os_ref[0] * xs_ref[:]
        x1_ref[j] = x1
        x1_out_ref[...] = x1

    @pl.when(j == n_o)
    def _norm_boundary():
        x1 = x1_ref[...]                                   # (n_o, bm, bn)
        ssum = jnp.sum(jnp.sum(x1 * x1, axis=2, keepdims=True), axis=0,
                       keepdims=True)                      # (1, bm, 1)
        inv = jax.lax.rsqrt(ssum / (n_o * bn) + eps)
        h = x1 * inv * nw_ref[0]
        amax = jnp.max(jnp.max(jnp.abs(h), axis=2, keepdims=True), axis=0,
                       keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)
        hq_ref[...] = jnp.clip(jnp.round(h / s), -128, 127).astype(jnp.int8)
        hs_ref[...] = jnp.broadcast_to(s[0], hs_ref.shape)

    @pl.when(j >= n_o)
    def _gu_phase():
        def k_slice(a, b):
            return hq_ref[a // bn, :, a % bn:a % bn + group]

        acc = jnp.zeros((bm, bn), jnp.int32)
        acc = _pair_dot_acc(
            k_slice, gw_ref.at[0],
            lambda w: gm_ref[0, w, :].reshape(1, -1), g1 // 2, group, acc,
        )
        gu_out_ref[...] = (
            acc.astype(jnp.float32) * gs_ref[0] * hs_ref[:, :1]
        ).astype(jnp.bfloat16)


def fused_o_gu_stacked(
    attn: jax.Array,       # (M, K1) bf16/f32 — attention output
    x_res: jax.Array,      # (M, H) — residual input
    norm_w: jax.Array,     # (L, H) — stacked post-attention norm weights
    o_w, o_mp, o_sc,       # stacked two-level o_proj (paired, packed mult)
    gu_w, gu_mp, gu_sc,    # stacked gateup
    layer: jax.Array,
    group_size: int = 128,
    eps: float = 1e-5,
    block_n: Optional[int] = None,
):
    """One-pallas_call layer *head-of-tail*: returns
    ``(x1, gu) = (x_res + o_proj(attn), gateup(requant(rmsnorm(x1))))``.

    Large-batch counterpart of `fused_o_mlp_stacked` — see
    `_fused_o_gu_kernel`. The caller finishes the layer with
    silu(gate)*up -> rowwise requant -> down GEMV -> + x1 (identical math
    to the unfused path; `fused_o_gu_reference` is the oracle).
    """
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K1 = attn.shape
    L, _, H = o_w.shape
    N_GU = gu_w.shape[2]
    g1 = K1 // group_size
    gh = H // group_size  # gate/up contract over the HIDDEN axis

    if not _on_tpu():
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, keepdims=False)
        return fused_o_gu_reference(
            attn.astype(jnp.float32), x_res.astype(jnp.float32), idx(norm_w),
            idx(o_w), unpack_mult_nibbles(idx(o_mp), g1), idx(o_sc),
            idx(gu_w), unpack_mult_nibbles(idx(gu_mp), gh), idx(gu_sc),
            group_size, eps,
        )
    # the kernel reuses the o-phase group count for the gu dots — true for
    # every Llama config served here (nh * d == hidden)
    assert H == K1, (H, K1)

    bm = max(8, M)
    if M < 8:
        attn = jnp.pad(attn, ((0, 8 - M), (0, 0)))
        x_res = jnp.pad(x_res, ((0, 8 - M), (0, 0)))
    if block_n is None:
        block_n = flags.two_level_block_n()
    bn = _round_block(block_n, 128, min(H, N_GU))

    def _vmem_estimate(bn_):
        scratch = bm * (4 * H + H + 4 * 128)      # x1 f32 + hq i8 + hs
        io = bm * (K1 + 4 * bn_ + 4 * bn_ + 2 * bn_)  # xq + res + outs
        wblocks = 2 * bn_ * (K1 // 2 + K1 // 2)   # o + gu, double-buffered
        return scratch + io + wblocks
    while bn > 128 and _vmem_estimate(bn) > 14 * (1 << 20):
        bn //= 2
    assert H % bn == 0 and N_GU % bn == 0, (H, N_GU, bn)
    n_o, n_gu = H // bn, N_GU // bn

    x_q, x_s = quantize_rowwise(attn.reshape(bm, K1))

    def _o_idx(j, l):
        return (l[0], 0, jnp.minimum(j, n_o - 1))

    def _gu_idx(j, l):
        return (l[0], 0, jnp.clip(j - n_o, 0, n_gu - 1))

    p1 = o_mp.shape[1]
    res_blocked = (
        x_res.astype(jnp.float32).reshape(bm, n_o, bn).transpose(1, 0, 2)
    )
    nw_blocked = norm_w.astype(jnp.float32).reshape(L, n_o, 1, bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_o + n_gu,),
        in_specs=[
            pl.BlockSpec((bm, K1), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, bn), lambda j, l: (jnp.minimum(j, n_o - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_o, 1, bn), lambda j, l: (l[0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1 // 2, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p1, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1 // 2, bn), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p1, bn), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), _gu_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, bn), lambda j, l: (0, jnp.minimum(j, n_o - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda j, l: (0, jnp.clip(j - n_o, 0, n_gu - 1)),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_o, bm, bn), jnp.float32),        # x1
            pltpu.VMEM((n_o, bm, bn), jnp.int8),           # hq (H == K1)
            pltpu.VMEM((bm, 128), jnp.float32),            # hs
        ],
    )
    x1, gu = pl.pallas_call(
        functools.partial(
            _fused_o_gu_kernel,
            n_o=n_o, n_gu=n_gu, g1=g1, group=group_size, bn=bn, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bm, H), jnp.float32),
            jax.ShapeDtypeStruct((bm, N_GU), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (K1 * H + K1 * N_GU),
            bytes_accessed=(K1 * H + K1 * N_GU) // 2 + bm * (K1 + 3 * H),
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_q, x_s.reshape(bm, 1).astype(jnp.float32),
      res_blocked, nw_blocked,
      o_w, o_mp, o_sc.astype(jnp.float32).reshape(L, 1, H),
      gu_w, gu_mp, gu_sc.astype(jnp.float32).reshape(L, 1, N_GU))
    return x1[:M], gu[:M]


def fused_o_gu_reference(
    attn, x_res, norm_w, o_w, o_m, o_s, gu_w, gu_m, gu_s,
    group_size=128, eps=1e-5,
):
    """XLA oracle for the fused o+gateup head-of-tail (per-layer
    operands): exactly the kernel's math — f32 residual chain, dynamic
    int8 requant of the normed hidden, two-level W4A8 matmuls, gu staged
    through bf16."""
    x_q, x_s = quantize_rowwise(attn)
    o_out = matmul_w4a8_2l_reference(
        x_q, x_s, o_w, o_m, o_s, None, group_size, jnp.float32, paired=True
    )
    x1 = x_res.astype(jnp.float32) + o_out
    inv = jax.lax.rsqrt(jnp.mean(x1 * x1, axis=1, keepdims=True) + eps)
    h = x1 * inv * norm_w[None, :].astype(jnp.float32)
    h_q, h_s = quantize_rowwise(h)
    gu = matmul_w4a8_2l_reference(
        h_q, h_s, gu_w, gu_m, gu_s, None, group_size, jnp.float32, paired=True
    ).astype(jnp.bfloat16)
    return x1, gu


def fused_o_mlp_reference(
    attn, x_res, norm_w,
    o_w, o_m, o_s, gu_w, gu_m, gu_s, dn_w, dn_m, dn_s,
    group_size=128, eps=1e-5,
):
    """XLA oracle for the fused layer tail (per-layer, unstacked operands).

    Exactly the fused kernel's math: f32 residual chain, dynamic int8
    activation quantization at each matmul input, two-level W4A8 matmuls.
    """
    from fastforward_tpu.kernels.matmul import matmul_w4a8_2l_reference

    x_q, x_s = quantize_rowwise(attn)
    o_out = matmul_w4a8_2l_reference(
        x_q, x_s, o_w, o_m, o_s, None, group_size, jnp.float32, paired=True
    )
    x1 = x_res.astype(jnp.float32) + o_out
    inv = jax.lax.rsqrt(jnp.mean(x1 * x1, axis=1, keepdims=True) + eps)
    h = x1 * inv * norm_w[None, :].astype(jnp.float32)
    h_q, h_s = quantize_rowwise(h)
    gu = matmul_w4a8_2l_reference(
        h_q, h_s, gu_w, gu_m, gu_s, None, group_size, jnp.float32, paired=True
    )
    # the kernel stages the gate/up output through bf16 scratch (VMEM)
    gu = gu.astype(jnp.bfloat16).astype(jnp.float32)
    inter = gu.shape[1] // 2
    gate, up = gu[:, :inter], gu[:, inter:]
    gated = gate * jax.nn.sigmoid(gate) * up
    g_q, g_s = quantize_rowwise(gated)
    dn = matmul_w4a8_2l_reference(
        g_q, g_s, dn_w, dn_m, dn_s, None, group_size, jnp.float32, paired=True
    )
    return x1 + dn


def fused_o_mlp_stacked(
    attn: jax.Array,       # (M, K1) bf16/f32 — attention output
    x_res: jax.Array,      # (M, H) — residual input
    norm_w: jax.Array,     # (L, H) — stacked post-attention norm weights
    o_w, o_mp, o_sc,       # stacked two-level o_proj (paired, packed mult)
    gu_w, gu_mp, gu_sc,    # stacked gateup
    dn_w, dn_mp, dn_sc,    # stacked down
    layer: jax.Array,
    group_size: int = 128,
    eps: float = 1e-5,
    block_n: Optional[int] = None,
) -> jax.Array:
    """One-pallas_call layer tail: y = x1 + down(silu-mlp(rmsnorm(x1)))
    with x1 = x_res + o_proj(attn); all three matmuls stream their stacked
    two-level W4A8 weights through a single continuous grid.

    Requires the paired layout with nibble-packed multipliers and
    H % bn == 0, 2*inter % bn == 0. Single-shard only (the o_proj partial
    sum is consumed in-kernel — incompatible with row-parallel TP psum);
    the TP path keeps the unfused calls.
    """
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K1 = attn.shape
    L, _, H = o_w.shape
    N_GU = gu_w.shape[2]
    K2h = dn_w.shape[1]
    K2 = K2h * 2
    inter = N_GU // 2
    g1 = K1 // group_size
    g2 = K2 // group_size

    if not _on_tpu():
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, keepdims=False)
        return fused_o_mlp_reference(
            attn.astype(jnp.float32), x_res.astype(jnp.float32), idx(norm_w),
            idx(o_w), unpack_mult_nibbles(idx(o_mp), g1), idx(o_sc),
            idx(gu_w), unpack_mult_nibbles(idx(gu_mp), g1), idx(gu_sc),
            idx(dn_w), unpack_mult_nibbles(idx(dn_mp), g2), idx(dn_sc),
            group_size, eps,
        ).astype(attn.dtype)

    bm = max(8, M)
    if M < 8:
        attn = jnp.pad(attn, ((0, 8 - M), (0, 0)))
        x_res = jnp.pad(x_res, ((0, 8 - M), (0, 0)))
    if block_n is None:
        block_n = flags.two_level_block_n()
    bn = _round_block(block_n, 128, min(H, N_GU))
    # Scoped-VMEM budget: activation scratch scales with bm, the
    # double-buffered weight blocks with bn. At bm=64 (batch-64 decode)
    # bn=512 overflows the 16 MB scoped limit — shrink bn until the
    # estimate fits (weights dominate; ~14 MB leaves room for IO blocks).
    def _vmem_estimate(bn_):
        scratch = bm * (4 * H + K1 + 2 * N_GU + K2 // 2 + 8 * 128)
        io = bm * (K1 + 4 * H)  # x_q + block-major residual
        wblocks = 2 * bn_ * (K1 // 2 + K1 // 2 + K2h)
        return scratch + io + wblocks
    while bn > 128 and _vmem_estimate(bn) > 14 * (1 << 20):
        bn //= 2
    assert H % bn == 0 and N_GU % bn == 0, (H, N_GU, bn)
    n_o, n_gu, n_dn = H // bn, N_GU // bn, H // bn

    x_q, x_s = quantize_rowwise(attn.reshape(bm, K1))

    def _o_idx(j, l):
        return (l[0], 0, jnp.minimum(j, n_o - 1))

    def _gu_idx(j, l):
        return (l[0], 0, jnp.clip(j - n_o, 0, n_gu - 1))

    def _dn_idx(j, l):
        return (l[0], 0, jnp.clip(j - n_o - n_gu, 0, n_dn - 1))

    p1 = o_mp.shape[1]
    p2 = dn_mp.shape[1]
    # Block-major activations for the kernel (see kernel docstring): the
    # residual and norm weights are rearranged outside (tiny XLA transposes).
    res_blocked = (
        x_res.astype(jnp.float32).reshape(bm, n_o, bn).transpose(1, 0, 2)
    )
    nw_blocked = norm_w.astype(jnp.float32).reshape(L, n_o, 1, bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_o + n_gu + n_dn,),
        in_specs=[
            pl.BlockSpec((bm, K1), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_o, bm, bn), lambda j, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_o, 1, bn), lambda j, l: (l[0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1 // 2, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p1, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), _o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1 // 2, bn), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p1, bn), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), _gu_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2h, bn), _dn_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p2, bn), _dn_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), _dn_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda j, l: (0, jnp.clip(j - n_o - n_gu, 0, n_dn - 1)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_o, bm, bn), jnp.float32),        # x1
            pltpu.VMEM((n_o, bm, bn), jnp.int8),           # hq (H == K1)
            pltpu.VMEM((bm, 128), jnp.float32),            # hs
            pltpu.VMEM((n_gu, bm, bn), jnp.bfloat16),      # gu out
            pltpu.VMEM((n_gu // 2, bm, bn), jnp.int8),     # x2
            pltpu.VMEM((bm, 128), jnp.float32),            # x2s
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_o_mlp_kernel,
            n_o=n_o, n_gu=n_gu, n_dn=n_dn, g1=g1, g2=g2,
            group=group_size, bn=bn, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (K1 * H + K1 * N_GU + K2 * H),
            bytes_accessed=(K1 * H + K1 * N_GU + K2 * H) // 2 + bm * (K1 + 3 * H),
            transcendentals=bm * inter,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_q, x_s.reshape(bm, 1).astype(jnp.float32),
      res_blocked, nw_blocked,
      o_w, o_mp, o_sc.astype(jnp.float32).reshape(L, 1, H),
      gu_w, gu_mp, gu_sc.astype(jnp.float32).reshape(L, 1, N_GU),
      dn_w, dn_mp, dn_sc.astype(jnp.float32).reshape(L, 1, H))
    return out[:M].astype(attn.dtype)


def _fused_norm_qkv_kernel(
    l_ref,
    x_ref,      # (bm, K) bf16/f32 — residual stream
    nw_ref,     # (1, 1, K) f32 — input norm weight (layer block)
    w_ref, m_ref, sc_ref,       # qkv weight blocks (layer-indexed)
    out_ref,    # (bm, bn)
    hq_ref,     # scratch (bm, K) int8 — quantized normed hidden
    hs_ref,     # scratch (bm, 128) f32 — its row scale
    *,
    n_groups: int, group: int, eps: float,
):
    j = pl.program_id(0)
    bm = x_ref.shape[0]

    @pl.when(j == 0)
    def _norm_quant():
        xf = x_ref[...].astype(jnp.float32)
        k = xf.shape[1]
        inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=1, keepdims=True) / k + eps)
        h = xf * inv * nw_ref[0]
        amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)
        hq_ref[...] = jnp.clip(jnp.round(h / s), -128, 127).astype(jnp.int8)
        hs_ref[...] = jnp.broadcast_to(s, hs_ref.shape)

    acc = jnp.zeros((bm, out_ref.shape[1]), jnp.int32)
    acc = _pair_dot_acc(
        lambda a, b: hq_ref[:, a:b], w_ref.at[0],
        lambda w: m_ref[0, w, :].reshape(1, -1), n_groups // 2, group, acc,
    )
    out_ref[...] = (
        acc.astype(jnp.float32) * sc_ref[0] * hs_ref[:, :1]
    ).astype(out_ref.dtype)


def fused_norm_qkv_reference(
    x, norm_w, w, m, s, group_size=128, eps=1e-5,
):
    """XLA oracle for the fused layer head: rmsnorm (f32 chain) -> dynamic
    int8 row quantization -> two-level W4A8 GEMV (per-layer operands)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    h = xf * inv * norm_w[None, :].astype(jnp.float32)
    h_q, h_s = quantize_rowwise(h)
    return matmul_w4a8_2l_reference(
        h_q, h_s, w, m, s, None, group_size, jnp.float32, paired=True
    )


def _fused_norm_qkv_a4_kernel(
    l_ref, x_ref, nw_ref, w_ref, m_ref, sc_ref, out_ref, hq_ref, hs_ref,
    *, n_groups: int, group: int, eps: float,
):
    # A4 layer head: rmsnorm + dynamic int4 row quantization at grid step 0,
    # then the vertical-layout int4 GEMV (`_w4a4_2l_gemv_stacked_kernel`
    # body) against the bitcast weight panels.
    j = pl.program_id(0)
    bm = x_ref.shape[0]
    half = group // 2

    @pl.when(j == 0)
    def _norm_quant():
        xf = x_ref[...].astype(jnp.float32)
        k = xf.shape[1]
        inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=1, keepdims=True) / k + eps)
        h = xf * inv * nw_ref[0]
        amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        s = jnp.maximum(amax / 7.0, 1e-8)
        hq_ref[...] = jnp.clip(jnp.round(h / s), -8, 7).astype(jnp.int8)
        hs_ref[...] = jnp.broadcast_to(s, hs_ref.shape)

    x4 = hq_ref[...].astype(jnp.int4)
    acc_even = jnp.zeros((bm, out_ref.shape[1]), jnp.int32)
    acc_odd = jnp.zeros((bm, out_ref.shape[1]), jnp.int32)
    for g_i in range(n_groups):
        w4 = pltpu.bitcast(w_ref[0, g_i * half:(g_i + 1) * half, :], jnp.int4)
        d = jax.lax.dot(
            x4[:, g_i * group:(g_i + 1) * group], w4,
            preferred_element_type=jnp.int32,
        )
        word = m_ref[0, g_i // 8, :].reshape(1, -1)
        m_g = jnp.bitwise_and(word >> (4 * (g_i % 8)), 0xF)
        if g_i % 2 == 0:
            acc_even = acc_even + m_g * d
        else:
            acc_odd = acc_odd + m_g * d
    out_ref[...] = (
        (acc_even + acc_odd).astype(jnp.float32) * sc_ref[0] * hs_ref[:, :1]
    ).astype(out_ref.dtype)


def fused_norm_qkv_a4_reference(x, norm_w, w, m, s, group_size=512, eps=1e-5):
    """XLA oracle for the A4 layer head: rmsnorm -> dynamic int4 row
    quantization -> vertical-layout W4A4 GEMV (per-layer operands)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    h = xf * inv * norm_w[None, :].astype(jnp.float32)
    h_q, h_s = quantize_rowwise_a4(h)
    return matmul_w4a4_2l_reference(
        h_q, h_s, w, m, s, None, group_size, jnp.float32
    )


def fused_norm_qkv_stacked_a4(
    x: jax.Array,
    norm_w: jax.Array,
    w_packed: jax.Array,
    mult_packed: jax.Array,
    s_col: jax.Array,
    layer: jax.Array,
    group_size: int = 512,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
) -> jax.Array:
    """A4 analog of `fused_norm_qkv_stacked`: in-kernel rmsnorm + int4 row
    quantization at grid step 0 + the vertical-layout int4 qkv GEMV."""
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K = x.shape
    L, Kh, N = w_packed.shape
    n_groups = K // group_size

    if not _on_tpu():
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, keepdims=False)
        return fused_norm_qkv_a4_reference(
            x.astype(jnp.float32), idx(norm_w),
            idx(w_packed), unpack_mult_nibbles(idx(mult_packed), n_groups),
            idx(s_col), group_size, eps,
        ).astype(out_dtype)

    bm = max(8, M)
    if M < 8:
        x = jnp.pad(x, ((0, 8 - M), (0, 0)))
    if block_n is None:
        block_n = flags.two_level_block_n()
    bn = _round_block(block_n, 128, N)
    n_pack = mult_packed.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kh, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_norm_qkv_a4_kernel,
            n_groups=n_groups, group=group_size, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x, norm_w.astype(jnp.float32).reshape(L, 1, K),
      w_packed, mult_packed,
      s_col.astype(jnp.float32).reshape(L, 1, N))
    return out[:M]


def fused_norm_qkv_stacked(
    x: jax.Array,          # (M, K) — residual stream (pre input-norm)
    norm_w: jax.Array,     # (L, K) — stacked input norm weights
    w_packed: jax.Array,   # (L, K//2, N) paired two-level qkv weights
    mult_packed: jax.Array,  # (L, ceil(n_groups/8), N) int32
    s_col: jax.Array,      # (L, N)
    layer: jax.Array,
    group_size: int = 128,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
) -> jax.Array:
    """One-pallas_call layer head: qkv = rmsnorm(x) @ W_qkv[l], with the
    dynamic int8 activation quantization computed in-kernel at grid step 0
    (overlapped with the first weight panel's DMA). Removes the XLA
    rms_norm + quantize_rowwise round-trips and one call boundary per layer
    from the decode loop (docs/performance.md r2: per-call serial latency).

    Single-shard, decode-shaped (T == 1) only; the TP path keeps the
    unfused norm + GEMV calls (same constraint as `fused_o_mlp_stacked`).
    """
    from fastforward_tpu.kernels.packing import unpack_mult_nibbles

    M, K = x.shape
    L, Kh, N = w_packed.shape
    n_groups = K // group_size

    if not _on_tpu():
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, keepdims=False)
        return fused_norm_qkv_reference(
            x.astype(jnp.float32), idx(norm_w),
            idx(w_packed), unpack_mult_nibbles(idx(mult_packed), n_groups),
            idx(s_col), group_size, eps,
        ).astype(out_dtype)

    bm = max(8, M)
    if M < 8:
        x = jnp.pad(x, ((0, 8 - M), (0, 0)))
    if block_n is None:
        block_n = flags.two_level_block_n()
    bn = _round_block(block_n, 128, N)
    n_pack = mult_packed.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kh, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pack, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_norm_qkv_kernel,
            n_groups=n_groups, group=group_size, eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K + bm * N * 2,
            transcendentals=0,
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x, norm_w.astype(jnp.float32).reshape(L, 1, K),
      w_packed, mult_packed,
      s_col.astype(jnp.float32).reshape(L, 1, N))
    return out[:M]
