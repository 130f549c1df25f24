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
