from fastforward_tpu.quantization import affine, granularity, tiling
from fastforward_tpu.quantization.affine import (
    dequantize_by_tile,
    integer_maximum,
    integer_minimum,
    parameters_for_range,
    quantization_range,
    quantize_by_tile,
    quantize_dynamic_by_tile,
)
from fastforward_tpu.quantization.affine_function import (
    AffineQuantizationFunction,
    DynamicAffineQuantParams,
    StaticAffineQuantParams,
    dynamic_quantization_context,
    quantization_context,
    quantize_by_tile as quantize_by_tile_array,
    quantize_dynamically,
    quantize_per_block,
    quantize_per_channel,
    quantize_per_granularity,
    quantize_per_tensor,
)
from fastforward_tpu.quantization.function import (
    QuantizationContext,
    QuantizationFunction,
    QuantizationParameters,
    create_quantization_function,
    register_parameters,
    static_field,
)
from fastforward_tpu.quantization.granularity import (
    Granularity,
    PerBlock,
    PerChannel,
    PerTensor,
    PerTile,
    granularity_from_sizes,
    is_per_block,
    is_per_channel,
    is_per_tensor,
)
from fastforward_tpu.quantization.quantized_array import (
    QuantizedArray,
    apply_quantized,
    dequantize_if_quantized,
    is_quantized,
)
from fastforward_tpu.quantization.ste import round_ste, ste

__all__ = [
    "affine",
    "granularity",
    "tiling",
    "AffineQuantizationFunction",
    "DynamicAffineQuantParams",
    "StaticAffineQuantParams",
    "QuantizationContext",
    "QuantizationFunction",
    "QuantizationParameters",
    "QuantizedArray",
    "Granularity",
    "PerBlock",
    "PerChannel",
    "PerTensor",
    "PerTile",
]
