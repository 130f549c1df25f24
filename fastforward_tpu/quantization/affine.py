"""Affine quantization numerics.

The simulation tier: pure-jnp tiled affine quantize / dequantize with
hand-derived LSQ-style gradients under `jax.custom_vjp`, plus the range math
that converts (min, max) ranges to (scale, offset) parameters.

Parity:
  - integer grid + range math: reference `quantization/affine/range.py:9-122`
  - tiled quantize/dequantize/backward: reference
    `quantization/_quantizer_impl.py:144-285` and gradient convention of
    `quantization/affine/_autograd.py:4-16` (all gradient logic lives in
    quantize; dequantize backward is the identity).

TPU notes: the math runs in the interleaved grid/tile view (see
`tiling.apply_per_tile`) so there is no transpose on the hot path — XLA fuses
the whole quantize (divide, round, clamp, cast) into one VPU loop, and the
backward recomputes the cheap elementwise terms instead of saving them
(rematerialization trades FLOPs for HBM).
"""

import functools
from typing import Literal, Sequence

import jax
import jax.numpy as jnp

from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.quantization import tiling

TileOrShape = tiling.TileOrShape

__all__ = [
    "integer_minimum",
    "integer_maximum",
    "quantization_range",
    "parameters_for_range",
    "can_support_bitwidth",
    "quantize_by_tile",
    "dequantize_by_tile",
    "quantize_dynamic_by_tile",
]


def integer_minimum(num_bits: float) -> float:
    """Minimum value of the signed integer grid. Reference `range.py:9-17`."""
    return -(2.0 ** (num_bits - 1))


def integer_maximum(num_bits: float) -> float:
    """Maximum value of the signed integer grid. Reference `range.py:20-28`."""
    return -integer_minimum(num_bits) - 1


def quantization_range(scale, offset, num_bits: float):
    """The (min, max) real-valued range representable by (scale, offset).

    Parity: reference `range.py:31-51`.
    """
    offset = 0.0 if offset is None else offset
    range_min = (integer_minimum(num_bits) + offset) * scale
    range_max = (integer_maximum(num_bits) + offset) * scale
    return range_min, range_max


def parameters_for_range(
    min_range: jax.Array,
    max_range: jax.Array,
    num_bits: float,
    symmetric: bool,
    allow_one_sided: bool,
):
    """Compute affine (scale, offset) best representing [min_range, max_range].

    Parity: reference `range.py:54-122` including the one-sided (unsigned,
    Nagel et al. 2021) handling: a non-negative minimum with
    ``allow_one_sided`` becomes the asymmetric case with the offset pinned to
    the integer minimum.

    Returns ``(scale, offset)`` where ``offset`` is ``None`` in the symmetric
    two-sided case *when the inputs are concrete*. Under tracing the
    one-sided decision is data-dependent, so a zero offset array is returned
    instead of ``None`` (structurally identical quantization grid).
    """
    min_range = jnp.asarray(min_range, dtype=jnp.float32)
    max_range = jnp.asarray(max_range, dtype=jnp.float32)

    int_min = integer_minimum(num_bits)
    int_max = integer_maximum(num_bits)
    num_steps = 2.0**num_bits - 1
    eps = jnp.finfo(jnp.float32).eps

    global_min = jnp.min(min_range)
    traced = isinstance(jnp.asarray(global_min), jax.core.Tracer)

    def _sym(mn, mx):
        neg_scale = jnp.abs(mn) / abs(int_min)
        pos_scale = jnp.abs(mx) / abs(int_max)
        return jnp.maximum(neg_scale, pos_scale)

    def _asym(mn, mx):
        scale = jnp.clip((mx - mn) / num_steps, min=eps)
        offset = mn / scale - int_min
        return scale, offset

    if not traced:
        one_sided = bool(global_min >= 0) and allow_one_sided
        if symmetric and one_sided:
            return _asym(jnp.zeros_like(min_range), max_range)
        if symmetric:
            return _sym(min_range, max_range), None
        return _asym(min_range, max_range)

    # Traced path: keep the decision inside the jaxpr.
    one_sided = jnp.logical_and(global_min >= 0, allow_one_sided)
    if symmetric:
        asym_scale, asym_offset = _asym(jnp.zeros_like(min_range), max_range)
        sym_scale = _sym(min_range, max_range)
        scale = jnp.where(one_sided, asym_scale, sym_scale)
        offset = jnp.where(one_sided, asym_offset, jnp.zeros_like(asym_offset))
        return scale, offset
    return _asym(min_range, max_range)


@functools.lru_cache(maxsize=32)
def can_support_bitwidth(dtype, num_bits: float) -> bool:
    """True if ``dtype`` stores ``num_bits``-bit signed grid values losslessly.

    Parity: reference `_quantizer_impl.py:45-75` (mantissa bits + sign bit
    give mantissa+2 exactly-representable bits).
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        mantissa = jnp.finfo(dtype).nmant
        return mantissa + 2 >= num_bits
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).bits >= num_bits
    return False


def _check_output_dtype(dtype, num_bits: float) -> None:
    if not can_support_bitwidth(jnp.dtype(dtype), num_bits):
        raise QuantizationError(
            f"Provided dtype ({jnp.dtype(dtype)}) is not enough to store "
            f"{num_bits} bits quantized values."
        )


def _tile_sum(elem: jax.Array, data_shape: Sequence[int], tile: tuple[int, ...]) -> jax.Array:
    """Sum an elementwise (data-shaped) array per tile → flat (num_tiles,)."""
    tiled = elem.reshape(tiling.interleaved_shape(data_shape, tile))
    tile_axes = tuple(range(1, tiled.ndim, 2))
    return jnp.sum(tiled, axis=tile_axes).reshape(-1)


# --- static affine quantize (with LSQ/STE custom gradient) -----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _quantize_core(tile, num_bits, output_dtype, data, scale, offset):
    """Quantize ``data`` onto the signed integer grid, one (scale, offset)
    per tile. ``offset`` is a flat per-tile array (zeros for symmetric).
    """
    qmin = integer_minimum(num_bits)
    qmax = integer_maximum(num_bits)

    def op(d, s, o):
        return jnp.clip(jnp.round(d / s - jnp.round(o)), qmin, qmax)

    q = tiling.apply_per_tile(op, data, scale, offset, tile_size=tile)
    return q.astype(output_dtype)


def _quantize_core_fwd(tile, num_bits, output_dtype, data, scale, offset):
    return _quantize_core(tile, num_bits, output_dtype, data, scale, offset), (
        data,
        scale,
        offset,
    )


def _quantize_core_bwd(tile, num_bits, output_dtype, residuals, g):
    """Hand-derived backward. Parity: reference `_quantizer_impl.py:193-237`.

    - data grad: clipped STE (zero outside the grid range).
    - scale grad (LSQ): (round(x) - x) inside the range, (threshold + offset)
      outside; summed per tile.
    - offset grad: scale * g outside the range, zero inside; summed per tile.
    """
    data, scale, offset = residuals
    qmin = integer_minimum(num_bits)
    qmax = integer_maximum(num_bits)

    data_shape = data.shape
    sview = tiling.param_view(scale, data_shape, tile)
    oview = jnp.round(tiling.param_view(offset, data_shape, tile))
    dview = data.reshape(tiling.interleaved_shape(data_shape, tile))
    gview = jnp.asarray(g, dview.dtype).reshape(dview.shape)

    pre_round = dview / sview - oview
    q = jnp.round(pre_round)
    clip_mask = jnp.logical_or(q < qmin, q > qmax)

    dinput = jnp.where(clip_mask, 0.0, gview).reshape(data_shape)

    doffset_elem = jnp.where(clip_mask, sview * gview, 0.0).reshape(data_shape)
    doffset = _tile_sum(doffset_elem, data_shape, tile).reshape(offset.shape)
    doffset = doffset.astype(offset.dtype)

    clip_val = jnp.where(q < qmin, qmin, qmax) + oview
    dscale_elem = (jnp.where(clip_mask, clip_val, q - pre_round) * gview).reshape(data_shape)
    dscale = _tile_sum(dscale_elem, data_shape, tile).reshape(scale.shape)
    dscale = dscale.astype(scale.dtype)

    return dinput.astype(data.dtype), dscale, doffset


_quantize_core.defvjp(_quantize_core_fwd, _quantize_core_bwd)


def _compute_dtype(data_dtype) -> jnp.dtype:
    if jnp.issubdtype(data_dtype, jnp.floating):
        return jnp.dtype(data_dtype)
    return jnp.dtype(jnp.float32)


def quantize_by_tile(
    data: jax.Array,
    scale,
    offset=None,
    *,
    tile_size: TileOrShape = "data_shape",
    num_bits: float = 8,
    output_dtype=None,
) -> jax.Array:
    """Quantize ``data`` to grid values with per-tile affine parameters.

    Returns grid values (``round(x/scale - round(offset))`` clamped to the
    signed ``num_bits`` range) in ``output_dtype`` (default: ``data``'s
    floating dtype — the simulation tier; pass ``jnp.int8`` etc. for the
    execution tier).

    Parity: reference `_quantizer_impl.py:144-169`.
    """
    tile = tiling.resolve_tile_size(tile_size, data.shape)
    n = tiling.num_tiles(data.shape, tile)
    compute_dtype = _compute_dtype(data.dtype)
    out_dtype = jnp.dtype(output_dtype) if output_dtype is not None else compute_dtype
    _check_output_dtype(out_dtype, num_bits)

    scale = jnp.asarray(scale, dtype=compute_dtype).reshape(-1)
    scale = jnp.broadcast_to(scale, (n,)) if scale.size == 1 and n > 1 else scale
    if scale.shape != (n,):
        raise ValueError(
            f"scale has {scale.size} elements but data/tile layout implies {n} tiles"
        )
    if offset is None:
        offset = jnp.zeros_like(scale)
    else:
        offset = jnp.asarray(offset, dtype=compute_dtype).reshape(-1)
        offset = jnp.broadcast_to(offset, (n,)) if offset.size == 1 and n > 1 else offset

    data = data.astype(compute_dtype)
    return _quantize_core(tile, float(num_bits), out_dtype, data, scale, offset)


# --- dequantize (identity backward) -----------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _dequantize_core(tile, output_dtype, data_dtype, data, scale, offset):
    def op(d, s, o):
        return (d.astype(s.dtype) + jnp.round(o)) * s

    return tiling.apply_per_tile(op, data, scale, offset, tile_size=tile).astype(output_dtype)


def _dequantize_core_fwd(tile, output_dtype, data_dtype, data, scale, offset):
    return _dequantize_core(tile, output_dtype, data_dtype, data, scale, offset), (
        scale,
        offset,
    )


def _dequantize_core_bwd(tile, output_dtype, data_dtype, residuals, g):
    # Identity backward for data; no parameter gradients (the quantize op owns
    # all gradient logic). Parity: reference `_autograd.py:136-157`.
    scale, offset = residuals
    if jnp.issubdtype(data_dtype, jnp.floating):
        dinput = jnp.asarray(g, data_dtype)
    else:
        dinput = jnp.asarray(g)
    return dinput, jnp.zeros_like(scale), jnp.zeros_like(offset)


_dequantize_core.defvjp(_dequantize_core_fwd, _dequantize_core_bwd)


def dequantize_by_tile(
    data: jax.Array,
    scale,
    offset=None,
    *,
    tile_size: TileOrShape = "data_shape",
    output_dtype=None,
) -> jax.Array:
    """Dequantize grid values: ``(data + round(offset)) * scale`` per tile.

    Parity: reference `_quantizer_impl.py:172-190`.
    """
    tile = tiling.resolve_tile_size(tile_size, data.shape)
    n = tiling.num_tiles(data.shape, tile)
    param_dtype = _compute_dtype(
        jnp.result_type(jnp.asarray(scale).dtype)
        if not jnp.issubdtype(jnp.asarray(scale).dtype, jnp.floating)
        else jnp.asarray(scale).dtype
    )
    scale = jnp.asarray(scale, dtype=param_dtype).reshape(-1)
    scale = jnp.broadcast_to(scale, (n,)) if scale.size == 1 and n > 1 else scale
    if offset is None:
        offset = jnp.zeros_like(scale)
    else:
        offset = jnp.asarray(offset, dtype=param_dtype).reshape(-1)
        offset = jnp.broadcast_to(offset, (n,)) if offset.size == 1 and n > 1 else offset

    out_dtype = jnp.dtype(output_dtype) if output_dtype is not None else param_dtype
    return _dequantize_core(tile, out_dtype, jnp.dtype(data.dtype), data, scale, offset)


# --- dynamic quantization ----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _quantize_dynamic_core(tile, num_bits, symmetric, allow_one_sided, output_dtype, data):
    qmin = integer_minimum(num_bits)
    qmax = integer_maximum(num_bits)

    tiled = data.reshape(tiling.interleaved_shape(data.shape, tile))
    tile_axes = tuple(range(1, tiled.ndim, 2))
    min_range = jnp.min(tiled, axis=tile_axes).reshape(-1)
    max_range = jnp.max(tiled, axis=tile_axes).reshape(-1)

    scale, offset = parameters_for_range(
        min_range, max_range, num_bits, symmetric=symmetric, allow_one_sided=allow_one_sided
    )
    if offset is None:
        offset = jnp.zeros_like(scale)
    offset = jnp.round(offset)
    scale = scale.astype(data.dtype) if jnp.issubdtype(data.dtype, jnp.floating) else scale
    offset = offset.astype(scale.dtype)

    def op(d, s, o):
        return jnp.clip(jnp.round(d / s - o), qmin, qmax)

    q = tiling.apply_per_tile(op, data.astype(scale.dtype), scale, offset, tile_size=tile)
    return q.astype(output_dtype), scale, offset


def _quantize_dynamic_fwd(tile, num_bits, symmetric, allow_one_sided, output_dtype, data):
    out = _quantize_dynamic_core(tile, num_bits, symmetric, allow_one_sided, output_dtype, data)
    # Zero-size residual carrying only the data dtype for the backward cast.
    return out, jnp.zeros((0,), data.dtype)


def _quantize_dynamic_bwd(tile, num_bits, symmetric, allow_one_sided, output_dtype, residual, g):
    # Straight-through on the data only. Parity: reference `_autograd.py:107-133`.
    gq, _, _ = g
    return (jnp.asarray(gq, residual.dtype),)


_quantize_dynamic_core.defvjp(_quantize_dynamic_fwd, _quantize_dynamic_bwd)


def quantize_dynamic_by_tile(
    data: jax.Array,
    *,
    tile_size: TileOrShape = "data_shape",
    num_bits: float = 8,
    symmetric: bool = False,
    allow_one_sided: bool = True,
    output_dtype=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Dynamically quantize: per-tile min/max → (scale, offset) → quantize.

    Returns ``(grid_values, scale, offset)``; gradients are straight-through
    on the data. Parity: reference `_quantizer_impl.py:243-285`.
    """
    if data.size == 0:
        raise QuantizationError(
            f"Cannot dynamically quantize an empty tensor of shape {data.shape}"
        )
    tile = tiling.resolve_tile_size(tile_size, data.shape)
    compute_dtype = _compute_dtype(data.dtype)
    out_dtype = jnp.dtype(output_dtype) if output_dtype is not None else compute_dtype
    _check_output_dtype(out_dtype, num_bits)
    return _quantize_dynamic_core(
        tile, float(num_bits), bool(symmetric), bool(allow_one_sided), out_dtype,
        data.astype(compute_dtype),
    )
