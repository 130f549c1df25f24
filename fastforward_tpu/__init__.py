"""fastforward_tpu — a TPU-native neural-network quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
Qualcomm's FastForward (quantization simulation + execution, range
estimation, GPTQ, model conversion, export), extended with TPU-only
capabilities: fused low-bit Pallas kernels, mesh sharding of quantized
models, INT8 KV-cache and a serving engine.

Public API mirrors the reference's top-level `fastforward` namespace
(reference `src/fastforward/__init__.py`).
"""

from fastforward_tpu import dispatcher, exceptions, flags
from fastforward_tpu.dispatcher import (
    DispatcherPriority,
    Predicate,
    dispatch,
    predicate,
    register,
)
from fastforward_tpu.flags import (
    export_mode,
    get_export_mode,
    get_strict_quantization,
    get_use_kernels,
    set_export_mode,
    set_strict_quantization,
    set_use_kernels,
    strict_quantization,
    use_kernels,
)
from fastforward_tpu.quantization import (
    AffineQuantizationFunction,
    DynamicAffineQuantParams,
    Granularity,
    PerBlock,
    PerChannel,
    PerTensor,
    PerTile,
    QuantizationContext,
    QuantizationFunction,
    QuantizationParameters,
    QuantizedArray,
    StaticAffineQuantParams,
    granularity_from_sizes,
    is_quantized,
    quantize_dynamically,
    quantize_per_block,
    quantize_per_channel,
    quantize_per_granularity,
    quantize_per_tensor,
)
from fastforward_tpu.exceptions import AutoquantError, ExportError, QuantizationError

__version__ = "0.1.0"

__all__ = [
    "dispatcher",
    "exceptions",
    "flags",
    "DispatcherPriority",
    "Predicate",
    "dispatch",
    "predicate",
    "register",
    "QuantizedArray",
    "QuantizationContext",
    "QuantizationFunction",
    "QuantizationParameters",
    "AffineQuantizationFunction",
    "StaticAffineQuantParams",
    "DynamicAffineQuantParams",
    "Granularity",
    "PerTensor",
    "PerChannel",
    "PerBlock",
    "PerTile",
    "granularity_from_sizes",
    "is_quantized",
    "quantize_per_tensor",
    "quantize_per_channel",
    "quantize_per_block",
    "quantize_per_granularity",
    "quantize_dynamically",
    "QuantizationError",
    "ExportError",
    "AutoquantError",
    "strict_quantization",
    "export_mode",
    "use_kernels",
]


def __getattr__(name):
    # Lazy submodule access for heavier subsystems (ops pulls in the full
    # operator table; nn pulls in flax).
    import importlib

    if name in {
        "ops", "nn", "mpath", "range_setting", "kernels", "models",
        "parallel", "serving", "export", "algorithms", "quant_init", "testing",
    }:
        return importlib.import_module(f"fastforward_tpu.{name}")
    raise AttributeError(f"module 'fastforward_tpu' has no attribute {name!r}")
