"""fastforward_tpu.nn — quantizer modules and quantized NNX layers.

Parity: reference `fastforward.nn` namespace.
"""

from fastforward_tpu.nn.layers import (
    QuantizedConv,
    QuantizedDropout,
    QuantizedEinsum,
    QuantizedEmbed,
    QuantizedLayerNorm,
    QuantizedLinear,
    QuantizedRMSNorm,
    QuantizedRelu,
    QuantizedSilu,
    QuantizedSequential,
)
from fastforward_tpu.nn.linear_quantizer import DynamicLinearQuantizer, LinearQuantizer
from fastforward_tpu.nn.quantized_module import (
    SKIP_QUANTIZATION,
    QuantizedModule,
    check_quantizable,
    filter_quantized_module_map,
    named_quantizers,
    quantize_model,
    quantized_module_map,
    surrogate_quantized_modules,
    register_quantized_module,
    summarize_quantizers,
    surrogate_quantized_module,
)
from fastforward_tpu.nn.quantizer import (
    Quantizer,
    QuantizerMetadata,
    QuantizerStub,
    Tag,
)

__all__ = [
    "Quantizer",
    "QuantizerStub",
    "QuantizerMetadata",
    "Tag",
    "LinearQuantizer",
    "DynamicLinearQuantizer",
    "QuantizedModule",
    "quantize_model",
    "filter_quantized_module_map",
    "quantized_module_map",
    "surrogate_quantized_modules",
    "register_quantized_module",
    "named_quantizers",
    "summarize_quantizers",
    "surrogate_quantized_module",
    "check_quantizable",
    "SKIP_QUANTIZATION",
    "QuantizedLinear",
    "QuantizedEinsum",
    "QuantizedConv",
    "QuantizedEmbed",
    "QuantizedLayerNorm",
    "QuantizedRMSNorm",
    "QuantizedRelu",
    "QuantizedSilu",
    "QuantizedDropout",
    "QuantizedSequential",
]
