"""Grid-preserving kernels for affine QuantizedArrays.

Parity: reference `src/fastforward/quantization/_linear_quantized_ops.py` —
operations that can run *directly on the integer grid* without dequantizing:
shape ops on per-tensor quantized data, scalar multiplication (rescales the
grid), and concatenation of arrays sharing a quantization grid.

These register into the dispatcher at DEFAULT priority, so they win over the
dequantize fallback whenever their predicates match.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp

from fastforward_tpu import dispatcher
from fastforward_tpu.dispatcher import Predicate
from fastforward_tpu.quantization.affine_function import (
    AffineQuantizationFunction,
    StaticAffineQuantParams,
)
from fastforward_tpu.quantization.granularity import PerChannel, PerTensor
from fastforward_tpu.quantization.quantized_array import QuantizedArray


def _affine_params(value: Any) -> Optional[StaticAffineQuantParams]:
    if not isinstance(value, QuantizedArray):
        return None
    ctx = value.quantization_context
    if ctx.quantization_fn is not AffineQuantizationFunction:
        return None
    params = ctx.quantization_params
    if not isinstance(params, StaticAffineQuantParams):
        return None
    return params


def is_affine(value: Any) -> bool:
    """Predicate: value is an affine-quantized array.
    Parity: reference `_linear_quantized_ops.py:30-89`."""
    return _affine_params(value) is not None


def is_affine_per_tensor(value: Any) -> bool:
    params = _affine_params(value)
    return params is not None and isinstance(params.granularity, PerTensor)


def is_affine_per_channel(value: Any) -> bool:
    params = _affine_params(value)
    return params is not None and isinstance(params.granularity, PerChannel)


affine = Predicate(lambda x, *a, **k: is_affine(x), name="affine")
affine_per_tensor = Predicate(lambda x, *a, **k: is_affine_per_tensor(x), name="affine_per_tensor")


def _requantize_output(result: QuantizedArray, output_quantizer: Any) -> Any:
    if output_quantizer is None or getattr(output_quantizer, "is_stub", False):
        return result
    return output_quantizer(result.dequantize())


# --- shape ops on per-tensor quantized data ----------------------------------


@dispatcher.register("reshape", predicate=affine_per_tensor)
def _reshape_per_tensor(input: QuantizedArray, shape, *, output_quantizer=None):
    out = input.with_data(jnp.reshape(input.raw_data, tuple(shape)))
    return _requantize_output(out, output_quantizer)


@dispatcher.register("permute", predicate=affine_per_tensor)
def _permute_per_tensor(input: QuantizedArray, dims, *, output_quantizer=None):
    out = input.with_data(jnp.transpose(input.raw_data, axes=tuple(dims)))
    return _requantize_output(out, output_quantizer)


@dispatcher.register("transpose", predicate=affine_per_tensor)
def _transpose_per_tensor(input: QuantizedArray, dim0: int, dim1: int, *, output_quantizer=None):
    out = input.with_data(jnp.swapaxes(input.raw_data, dim0, dim1))
    return _requantize_output(out, output_quantizer)


# --- scalar multiplication: rescale the grid ---------------------------------


def _is_scalar(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


@dispatcher.register(
    "mul",
    predicate=Predicate(
        lambda input, other, *a, **k: is_affine(input) and _is_scalar(other)
        and _affine_params(input).offset is None,
        name="affine_scalar_mul",
    ),
)
def _mul_scalar(input: QuantizedArray, other: float, *, output_quantizer=None):
    """q stays, scale *= |s|; for negative s the grid values flip sign.

    Parity: reference `_linear_quantized_ops.py:153-170` (symmetric only —
    with an offset the rescaled grid no longer matches).
    """
    params = _affine_params(input)
    if other >= 0:
        new = input.with_context(
            input.quantization_context.with_changes(scale=params.scale * other)
        )
    else:
        new = QuantizedArray(
            -input.raw_data,
            input.quantization_context.with_changes(scale=params.scale * (-other)),
        )
    return _requantize_output(new, output_quantizer)


# --- concatenation of grid-compatible arrays ---------------------------------


def _grids_match(tensors: Sequence[Any]) -> bool:
    if not tensors or not all(is_affine_per_tensor(t) for t in tensors):
        return False
    first = _affine_params(tensors[0])
    for t in tensors[1:]:
        p = _affine_params(t)
        if p.num_bits != first.num_bits:
            return False
        # Scales/offsets must be *the same tracer/array object* or equal
        # concrete values; object identity is the trace-safe check.
        if p.scale is not first.scale and not _concrete_equal(p.scale, first.scale):
            return False
        if (p.offset is None) != (first.offset is None):
            return False
        if p.offset is not None and p.offset is not first.offset and not _concrete_equal(
            p.offset, first.offset
        ):
            return False
    return True


def _concrete_equal(a, b) -> bool:
    import jax

    if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
        return False
    try:
        return bool(jnp.all(jnp.asarray(a) == jnp.asarray(b)))
    except Exception:
        return False


@dispatcher.register(
    "cat",
    predicate=Predicate(lambda tensors, *a, **k: _grids_match(tensors), name="cat_same_grid"),
)
def _cat_same_grid(tensors: Sequence[QuantizedArray], dim: int = 0, *, output_quantizer=None):
    """Concatenate raw grids when all inputs share one quantization grid.
    Parity: reference `_linear_quantized_ops.py:174-240`."""
    data = jnp.concatenate([t.raw_data for t in tensors], axis=dim)
    out = tensors[0].with_data(data)
    return _requantize_output(out, output_quantizer)


# --- per-channel shape ops ----------------------------------------------------
#
# Parity: the reference registers per-channel predicates alongside the
# per-tensor ones (`_linear_quantized_ops.py:30-89`); scale/offset are stored
# as a flat (num_channels,) vector (one tile per channel index), so any axis
# permutation leaves the vector untouched — only the granularity's channel
# dim is remapped.


def _single_channel_dim(value: Any) -> Optional[int]:
    params = _affine_params(value)
    if params is None or not isinstance(params.granularity, PerChannel):
        return None
    dims = params.granularity.channel_dims
    return dims[0] if len(dims) == 1 else None


affine_per_channel = Predicate(
    lambda x, *a, **k: _single_channel_dim(x) is not None, name="affine_per_channel"
)


def _with_channel_dim(value: QuantizedArray, data, new_dim: int) -> QuantizedArray:
    ctx = value.quantization_context.with_changes(granularity=PerChannel(new_dim))
    return QuantizedArray(data, ctx)


@dispatcher.register("permute", predicate=affine_per_channel)
def _permute_per_channel(input: QuantizedArray, dims, *, output_quantizer=None):
    dims = tuple(dims)
    channel = _single_channel_dim(input)
    out = _with_channel_dim(
        input, jnp.transpose(input.raw_data, axes=dims), dims.index(channel)
    )
    return _requantize_output(out, output_quantizer)


@dispatcher.register("transpose", predicate=affine_per_channel)
def _transpose_per_channel(
    input: QuantizedArray, dim0: int, dim1: int, *, output_quantizer=None
):
    channel = _single_channel_dim(input)
    ndim = input.raw_data.ndim
    dim0, dim1 = dim0 % ndim, dim1 % ndim
    new_channel = channel
    if channel == dim0:
        new_channel = dim1
    elif channel == dim1:
        new_channel = dim0
    out = _with_channel_dim(
        input, jnp.swapaxes(input.raw_data, dim0, dim1), new_channel
    )
    return _requantize_output(out, output_quantizer)


def _channel_cat_compatible(tensors: Sequence[Any], dim: Any) -> bool:
    if not tensors or not isinstance(dim, int):
        return False
    channels = [_single_channel_dim(t) for t in tensors]
    if any(c is None for c in channels) or len(set(channels)) != 1:
        return False
    if channels[0] != dim % tensors[0].raw_data.ndim:
        return False
    first = _affine_params(tensors[0])
    for t in tensors[1:]:
        p = _affine_params(t)
        if p.num_bits != first.num_bits:
            return False
        if (p.offset is None) != (first.offset is None):
            return False
    return True


@dispatcher.register(
    "cat",
    predicate=Predicate(
        lambda tensors, dim=0, *a, **k: _channel_cat_compatible(tensors, dim),
        name="cat_per_channel_dim",
    ),
)
def _cat_per_channel(tensors: Sequence[QuantizedArray], dim: int = 0, *, output_quantizer=None):
    """Concatenate per-channel-quantized arrays ALONG the channel dim: grids
    stay exact because each channel keeps its own (scale, offset)."""
    first = _affine_params(tensors[0])
    data = jnp.concatenate([t.raw_data for t in tensors], axis=dim)
    scale = jnp.concatenate(
        [jnp.asarray(_affine_params(t).scale).reshape(-1) for t in tensors]
    )
    changes = {"scale": scale}
    if first.offset is not None:
        changes["offset"] = jnp.concatenate(
            [jnp.asarray(_affine_params(t).offset).reshape(-1) for t in tensors]
        )
    out = QuantizedArray(
        data, tensors[0].quantization_context.with_changes(**changes)
    )
    return _requantize_output(out, output_quantizer)


# --- sign / scalar-division ops ------------------------------------------------


def _int_bounds(num_bits: int) -> tuple[int, int]:
    return -(2 ** (num_bits - 1)), 2 ** (num_bits - 1) - 1


def _symmetric_affine(value: Any) -> bool:
    params = _affine_params(value)
    return params is not None and params.offset is None


@dispatcher.register(
    "negative",
    predicate=Predicate(
        lambda input, *a, **k: _symmetric_affine(input), name="affine_symmetric_neg"
    ),
)
def _neg_symmetric(input: QuantizedArray, *, output_quantizer=None):
    """Negate on the grid: ``-q`` at unchanged scale. Exact except for the
    ``int_min`` gridpoint, which saturates to ``int_max`` (the symmetric grid
    is [-2^(b-1), 2^(b-1)-1]; the reference's negative-scalar `mul` has the
    same corner, `_linear_quantized_ops.py:153-170`)."""
    params = _affine_params(input)
    lo, hi = _int_bounds(params.num_bits)
    q = input.raw_data
    if jnp.issubdtype(q.dtype, jnp.integer):
        negated = jnp.clip(-q.astype(jnp.int32), lo, hi).astype(q.dtype)
    else:
        # Simulation tier stores grid values in float; clamp keeps the
        # result a valid b-bit grid.
        negated = jnp.clip(-q, lo, hi)
    return _requantize_output(input.with_data(negated), output_quantizer)


@dispatcher.register(
    "positive",
    predicate=Predicate(lambda input, *a, **k: is_affine(input), name="affine_pos"),
)
def _pos(input: QuantizedArray, *, output_quantizer=None):
    return _requantize_output(input, output_quantizer)


@dispatcher.register(
    "div",
    predicate=Predicate(
        lambda input, other, *a, **k: _symmetric_affine(input)
        and _is_scalar(other) and other != 0,
        name="affine_scalar_div",
    ),
)
def _div_scalar(input: QuantizedArray, other: float, *, output_quantizer=None):
    """q / s == q at scale/s (symmetric grids only, like scalar mul)."""
    return _mul_scalar(input, 1.0 / other, output_quantizer=output_quantizer)


@dispatcher.register(
    "mul",
    predicate=Predicate(
        lambda input, other, *a, **k: _is_scalar(input)
        and _symmetric_affine(other),
        name="affine_scalar_rmul",
    ),
)
def _rmul_scalar(input: float, other: QuantizedArray, *, output_quantizer=None):
    return _mul_scalar(other, input, output_quantizer=output_quantizer)


# --- zero-exact padding ---------------------------------------------------------


@dispatcher.register(
    "pad",
    predicate=Predicate(
        lambda input, pad, mode="constant", value=None, *a, **k: (
            is_affine_per_tensor(input)
            and _symmetric_affine(input)
            and mode == "constant"
            and (value is None or value == 0.0)
        ),
        name="affine_pad_zero",
    ),
)
def _pad_zero(input: QuantizedArray, pad, mode="constant", value=None, *, output_quantizer=None):
    """Constant-0 padding on a symmetric grid: real 0.0 is exactly grid 0,
    so the pad happens on the raw integers (torch-style ``pad`` spec: pairs
    from the LAST dim backwards)."""
    pad = tuple(pad)
    ndim = input.raw_data.ndim
    pairs = [(0, 0)] * ndim
    for i in range(len(pad) // 2):
        pairs[ndim - 1 - i] = (pad[2 * i], pad[2 * i + 1])
    out = input.with_data(jnp.pad(input.raw_data, pairs))
    return _requantize_output(out, output_quantizer)
