"""Affine quantization function + parameter dataclasses + convenience APIs.

Parity: reference `src/fastforward/quantization/affine/function.py:31-213`
(param dataclasses + AffineQuantizationFunction) and
`affine/static.py` / `affine/dynamic.py` convenience constructors.
"""

import dataclasses
from typing import Any, Callable, Optional, Sequence, Union

import jax

from fastforward_tpu import flags
from fastforward_tpu.exceptions import ExportError
from fastforward_tpu.quantization import affine, granularity as granularities
from fastforward_tpu.quantization.function import (
    QuantizationContext,
    QuantizationFunction,
    QuantizationParameters,
    register_parameters,
    static_field,
)
from fastforward_tpu.quantization.quantized_array import QuantizedArray

Granularity = granularities.Granularity
ScaleOrFloat = Union[jax.Array, float]


@register_parameters
@dataclasses.dataclass
class StaticAffineQuantParams(QuantizationParameters):
    """Parameters for static affine quantization.

    Parity: reference `affine/function.py:31-41`.
    """

    scale: ScaleOrFloat
    offset: Optional[ScaleOrFloat]
    num_bits: int = static_field(default=8)
    granularity: Granularity = static_field(default_factory=granularities.PerTensor)
    quantized_dtype: Any = static_field(default=None)
    dequantize_dtype: Any = static_field(default=None)


@register_parameters
@dataclasses.dataclass
class DynamicAffineQuantParams(QuantizationParameters):
    """Parameters for dynamic affine quantization.

    Parity: reference `affine/function.py:50-60`.
    """

    num_bits: int = static_field(default=8)
    granularity: Granularity = static_field(default_factory=granularities.PerTensor)
    symmetric: bool = static_field(default=False)
    allow_one_sided: bool = static_field(default=True)
    quantized_dtype: Any = static_field(default=None)
    dequantize_dtype: Any = static_field(default=None)
    parameter_inference_fn: Optional[Callable] = static_field(default=None)


class AffineQuantizationFunction(QuantizationFunction):
    """Standard affine quantization: q = clamp(round(x/s - round(o))).

    Parity: reference `affine/function.py:66-188`.
    """

    @classmethod
    def quantize(cls, data: jax.Array, params):
        # Re-quantization: an already-quantized input moves onto this
        # quantizer's grid via its real values (chained quantizers are common
        # between layers — the producer's output quantizer feeds the
        # consumer's input quantizer).
        if isinstance(data, QuantizedArray):
            data = data.dequantize()
        if flags.get_export_mode():
            return cls._export_quantize(data, params)
        if isinstance(params, StaticAffineQuantParams):
            return cls._static_quantize(data, params)
        if isinstance(params, DynamicAffineQuantParams):
            return cls._dynamic_quantize(data, params)
        raise TypeError(f"Unsupported type for argument 'params': '{type(params)}'")

    @classmethod
    def _export_quantize(cls, data: jax.Array, params) -> jax.Array:
        """Quantize-then-dequantize, returning a plain array (QDQ form used
        while staging out an export graph). Reference `affine/function.py:94-121`.
        """
        if not isinstance(params, StaticAffineQuantParams):
            raise ExportError("Export supports only static affine quantization.")
        tile_size = params.granularity.tile_size(data.shape)
        q = affine.quantize_by_tile(
            data,
            params.scale,
            params.offset,
            tile_size=tile_size,
            num_bits=params.num_bits,
            output_dtype=params.quantized_dtype or data.dtype,
        )
        return affine.dequantize_by_tile(
            q,
            params.scale,
            params.offset,
            tile_size=tile_size,
            output_dtype=params.dequantize_dtype or data.dtype,
        )

    @classmethod
    def _static_quantize(cls, data: jax.Array, params: StaticAffineQuantParams):
        tile_size = params.granularity.tile_size(data.shape)
        q = affine.quantize_by_tile(
            data,
            params.scale,
            params.offset,
            tile_size=tile_size,
            num_bits=params.num_bits,
            output_dtype=params.quantized_dtype or data.dtype,
        )
        params = params.with_changes(dequantize_dtype=params.dequantize_dtype or data.dtype)
        return QuantizedArray(q, QuantizationContext(cls, params))

    @classmethod
    def _dynamic_quantize(cls, data: jax.Array, params: DynamicAffineQuantParams):
        if params.parameter_inference_fn is not None:
            scale, offset = params.parameter_inference_fn(params, data)
            static_params = _static_from_dynamic(
                params, scale, offset, dequantize_dtype=params.dequantize_dtype or data.dtype
            )
            return cls._static_quantize(data, static_params)

        tile_size = params.granularity.tile_size(data.shape)
        q, scale, offset = affine.quantize_dynamic_by_tile(
            data,
            tile_size=tile_size,
            num_bits=params.num_bits,
            symmetric=params.symmetric,
            allow_one_sided=params.allow_one_sided,
            output_dtype=params.quantized_dtype or data.dtype,
        )
        static_params = _static_from_dynamic(
            params, scale, offset, dequantize_dtype=params.dequantize_dtype or data.dtype
        )
        return QuantizedArray(q, QuantizationContext(cls, static_params))

    @classmethod
    def dequantize(cls, data: jax.Array, params) -> jax.Array:
        if isinstance(params, DynamicAffineQuantParams):
            raise TypeError("Cannot dequantize a QuantizedArray with dynamic parameters.")
        tile_size = params.granularity.tile_size(data.shape)
        return affine.dequantize_by_tile(
            data,
            params.scale,
            params.offset,
            tile_size=tile_size,
            output_dtype=params.dequantize_dtype,
        )


def _static_from_dynamic(
    params: DynamicAffineQuantParams,
    scale: jax.Array,
    offset: Optional[jax.Array],
    **changes: Any,
) -> StaticAffineQuantParams:
    """Convert dynamic params + inferred (scale, offset) to static params.

    Parity: reference `affine/function.py:191-213`.
    """
    static_fields = {f.name for f in dataclasses.fields(StaticAffineQuantParams)}
    args = {
        f.name: getattr(params, f.name)
        for f in dataclasses.fields(params)
        if f.name in static_fields
    }
    args["scale"] = scale
    args["offset"] = offset
    args.update(changes)
    return StaticAffineQuantParams(**args)


# --- convenience constructors (reference `affine/static.py`, `affine/dynamic.py`)


def quantization_context(
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    num_bits: int = 8,
    granularity: Optional[Granularity] = None,
    quantized_dtype: Any = None,
    dequantize_dtype: Any = None,
) -> QuantizationContext:
    """Build a static affine QuantizationContext."""
    params = StaticAffineQuantParams(
        scale=scale,
        offset=offset,
        num_bits=num_bits,
        granularity=granularity or granularities.PerTensor(),
        quantized_dtype=quantized_dtype,
        dequantize_dtype=dequantize_dtype,
    )
    return QuantizationContext(AffineQuantizationFunction, params)


def dynamic_quantization_context(
    *,
    num_bits: int = 8,
    granularity: Optional[Granularity] = None,
    symmetric: bool = False,
    allow_one_sided: bool = True,
    quantized_dtype: Any = None,
    dequantize_dtype: Any = None,
) -> QuantizationContext:
    """Build a dynamic affine QuantizationContext."""
    params = DynamicAffineQuantParams(
        num_bits=num_bits,
        granularity=granularity or granularities.PerTensor(),
        symmetric=symmetric,
        allow_one_sided=allow_one_sided,
        quantized_dtype=quantized_dtype,
        dequantize_dtype=dequantize_dtype,
    )
    return QuantizationContext(AffineQuantizationFunction, params)


def quantize_per_granularity(
    data: jax.Array,
    granularity: Granularity,
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    num_bits: int = 8,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Statically quantize ``data`` using an explicit granularity.

    Parity: reference `affine/static.py:184-213`.
    """
    context = quantization_context(
        scale, offset, num_bits=num_bits, granularity=granularity,
        quantized_dtype=quantized_dtype,
    )
    return context.quantize(data)


def quantize_per_tensor(
    data: jax.Array,
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    num_bits: int = 8,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Parity: reference `affine/static.py:91`."""
    return quantize_per_granularity(
        data, granularities.PerTensor(), scale, offset,
        num_bits=num_bits, quantized_dtype=quantized_dtype,
    )


def quantize_per_channel(
    data: jax.Array,
    channel_dim: int | Sequence[int],
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    num_bits: int = 8,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Parity: reference `affine/static.py:124`."""
    return quantize_per_granularity(
        data, granularities.PerChannel(channel_dim), scale, offset,
        num_bits=num_bits, quantized_dtype=quantized_dtype,
    )


def quantize_by_tile(
    data: jax.Array,
    tile_size: Sequence[int],
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    num_bits: int = 8,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Parity: reference `affine/static.py:153`."""
    return quantize_per_granularity(
        data, granularities.PerTile(tuple(tile_size)), scale, offset,
        num_bits=num_bits, quantized_dtype=quantized_dtype,
    )


def quantize_per_block(
    data: jax.Array,
    block_dims: int | Sequence[int],
    block_sizes: int | Sequence[int],
    scale: ScaleOrFloat,
    offset: Optional[ScaleOrFloat] = None,
    *,
    per_channel_dims: int | Sequence[int] = (),
    num_bits: int = 8,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Parity: reference `affine/static.py:124-182`."""
    gran = granularities.PerBlock(block_dims, block_sizes, per_channel_dims)
    return quantize_per_granularity(
        data, gran, scale, offset, num_bits=num_bits, quantized_dtype=quantized_dtype,
    )


def quantize_dynamically(
    data: jax.Array,
    granularity: Optional[Granularity] = None,
    *,
    num_bits: int = 8,
    symmetric: bool = False,
    allow_one_sided: bool = True,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Dynamically quantize with per-call min/max parameter inference.

    Parity: reference `affine/dynamic.py:22-56`.
    """
    context = dynamic_quantization_context(
        num_bits=num_bits,
        granularity=granularity,
        symmetric=symmetric,
        allow_one_sided=allow_one_sided,
        quantized_dtype=quantized_dtype,
    )
    return context.quantize(data)
