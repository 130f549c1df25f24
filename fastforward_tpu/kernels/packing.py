"""INT4 packing for weight-only quantization.

Two int4 grid values share one int8 byte. Layout is chosen for the TPU
kernel's unpack path (`kernels/matmul.py`): within every K-group of
``2*half`` rows, packed row ``i`` holds original row ``i`` in its low nibble
and original row ``i + half`` in its high nibble. Unpacking a packed tile is
then two arithmetic shifts and a concat — the rows come out in original
order, no interleave/transpose needed (dot products are invariant to the
row permutation anyway, but identity order keeps scales aligned).

SURVEY §7 "hard parts": INT4 packing affects checkpoint format and dequant
kernels; this module is the single source of truth for the layout.
"""

import jax
import jax.numpy as jnp


def pack_int4(w: jax.Array, group_size: int = 128) -> jax.Array:
    """Pack int4 grid values (int8 storage, range [-8, 7]) along axis 0.

    ``w``: (K, N) int8/int32 grid values; K must be divisible by
    ``group_size`` and ``group_size`` by 2. Returns (K//2, N) int8.
    """
    K, N = w.shape
    if K % group_size != 0:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    half = group_size // 2
    w = w.astype(jnp.int8).reshape(K // group_size, group_size, N)
    low = w[:, :half]
    high = w[:, half:]
    packed = (low & 0xF) | (high << 4)
    return packed.reshape(K // 2, N).astype(jnp.int8)


def pack_uint4_offset(w: jax.Array, group_size: int = 128) -> jax.Array:
    """Pack int4 grid values as *offset-binary* nibbles (u = v + 8 ∈ [0, 15]).

    Same layout as :func:`pack_int4` but each stored nibble is the unsigned
    offset pattern. This is the at-rest format of the two-level W4A8 mode:
    the decode kernel's SWAR scale-fold needs u directly, so pre-offsetting
    at pack time removes one packed-XOR per nibble-plane per group from the
    per-token critical path.
    """
    K, N = w.shape
    if K % group_size != 0:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    half = group_size // 2
    u = (w.astype(jnp.int32) + 8).reshape(K // group_size, group_size, N)
    low = u[:, :half]
    high = u[:, half:]
    packed = low | (high << 4)
    return packed.reshape(K // 2, N).astype(jnp.int8)


def pack_uint4_offset_paired(w: jax.Array, group_size: int = 128) -> jax.Array:
    """Offset-binary packing pairing *adjacent groups* instead of group halves.

    Byte row ``i`` of pair block ``p`` holds original row ``2p*g + i`` (low
    nibble, group ``2p``) and row ``(2p+1)*g + i`` (high nibble, group
    ``2p+1``), ``i ∈ [0, g)``. Each nibble plane of a pair block is then a
    complete g-row dot operand: the decode kernel folds each plane with its
    own group scale and feeds the MXU directly — no lo/hi concatenate on the
    per-token critical path (the concat forced a VMEM round-trip per group).
    Requires an even number of K-groups.
    """
    K, N = w.shape
    if K % (2 * group_size) != 0:
        raise ValueError(
            f"K={K} needs an even number of groups of {group_size} for paired packing"
        )
    u = (w.astype(jnp.int32) + 8).reshape(K // (2 * group_size), 2, group_size, N)
    packed = u[:, 0] | (u[:, 1] << 4)
    return packed.reshape(K // 2, N).astype(jnp.int8)


def unpack_uint4_offset_paired(packed: jax.Array, group_size: int = 128) -> jax.Array:
    """Inverse of :func:`pack_uint4_offset_paired`: (K//2, N) → (K, N) int8."""
    K2, N = packed.shape
    p = packed.astype(jnp.int32).reshape(K2 // group_size, group_size, N)
    low = (p & 0xF) - 8
    high = ((p >> 4) & 0xF) - 8
    return jnp.stack([low, high], axis=1).reshape(2 * K2, N).astype(jnp.int8)


def unpack_uint4_offset(packed: jax.Array, group_size: int = 128) -> jax.Array:
    """Inverse of :func:`pack_uint4_offset`: (K//2, N) → (K, N) int8 in [-8, 7]."""
    K2, N = packed.shape
    half = group_size // 2
    p = packed.astype(jnp.int32).reshape(K2 // half, half, N)
    low = (p & 0xF) - 8
    high = ((p >> 4) & 0xF) - 8
    return jnp.concatenate([low, high], axis=1).reshape(2 * K2, N).astype(jnp.int8)


def unpack_int4(packed: jax.Array, group_size: int = 128) -> jax.Array:
    """Inverse of :func:`pack_int4`: (K//2, N) int8 → (K, N) int8 in [-8, 7]."""
    K2, N = packed.shape
    half = group_size // 2
    p = packed.reshape(K2 // half, half, N)
    low = ((p << 4).astype(jnp.int8) >> 4).astype(jnp.int8)  # sign-extend
    high = (p >> 4).astype(jnp.int8)
    return jnp.concatenate([low, high], axis=1).reshape(2 * K2, N)


def pack_mult_nibbles(mult: jax.Array) -> jax.Array:
    """Pack two-level multipliers (values in [1, 15]) 8-per-int32 nibble-wise
    along the group axis: (..., n_groups, N) → (..., ceil(n_groups/8), N) i32.

    Group g lands in nibble ``g % 8`` (bits 4*(g%8) .. 4*(g%8)+3) of word
    ``g // 8``. Padding groups encode multiplier 1. Shrinks the decode-loop
    multiplier traffic 8× vs int32-at-rest and keeps the whole-array operand
    small enough that XLA never stages it into scoped memory per layer step
    (the int32 (L, 112, 4096) down-proj mult was re-copied every layer:
    ~2.3 ms/step on the 8B decode loop).
    """
    ng = mult.shape[-2]
    pad = (-ng) % 8
    if pad:
        ones = jnp.ones((*mult.shape[:-2], pad, mult.shape[-1]), mult.dtype)
        mult = jnp.concatenate([mult, ones], axis=-2)
    g8 = mult.reshape(*mult.shape[:-2], -1, 8, mult.shape[-1]).astype(jnp.int32)
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4).reshape(
        *([1] * (g8.ndim - 2)), 8, 1
    )
    return jnp.sum(g8 << shifts, axis=-2)


def unpack_mult_nibbles(packed: jax.Array, n_groups: int) -> jax.Array:
    """Inverse of :func:`pack_mult_nibbles` (drops padding groups)."""
    words = packed[..., :, None, :]
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4).reshape(
        *([1] * (packed.ndim - 1)), 8, 1
    )
    nib = jnp.bitwise_and(words >> shifts, 0xF)
    out = nib.reshape(*packed.shape[:-2], -1, packed.shape[-1])
    return out[..., :n_groups, :]


def pack_int4_vertical(w: jax.Array) -> jax.Array:
    """Pack int4 grid values so `pltpu.bitcast(packed, int4)` restores row
    order — the W4A4 at-rest layout.

    Byte row ``r`` holds original row ``2r`` in its LOW nibble and row
    ``2r + 1`` in its HIGH nibble; Mosaic's int8→int4 bitcast emits the
    (lo, hi) nibbles of byte row ``r`` as int4 rows ``2r, 2r + 1`` (probed
    on v5e), so the A4 GEMV consumes weight panels with ONE bitcast and
    zero nibble arithmetic — vs ~6 wide VPU ops per pair in the SWAR-fold
    W4A8 kernels. Nibbles are plain two's-complement (no offset-binary:
    the bitcast sign-extends natively).

    ``w``: (K, N) int8 grid values in [-8, 7], K even. Returns (K//2, N).
    """
    K, N = w.shape
    if K % 2 != 0:
        raise ValueError(f"K={K} must be even")
    w = w.astype(jnp.int8).reshape(K // 2, 2, N)
    return ((w[:, 0] & 0xF) | (w[:, 1] << 4)).astype(jnp.int8)


def unpack_int4_vertical(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4_vertical`: (K//2, N) → (K, N) int8."""
    lo = ((packed << 4).astype(jnp.int8) >> 4).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(
        packed.shape[0] * 2, packed.shape[1]
    )
