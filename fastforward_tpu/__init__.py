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
    "trace_quantization_sites",
    "JaxprQuantizationPlan",
]


_LAZY_SUBMODULES = {
    "ops", "nn", "mpath", "range_setting", "kernels", "models",
    "parallel", "serving", "export", "algorithms", "quant_init", "testing",
    "overrides", "autoquant", "native",
}

# Submodule aliases matching the reference namespace layout
# (`fastforward.affine`, `fastforward.granularity`, `fastforward.random`,
# `fastforward.logging_utils`, `fastforward.dataclasses`,
# `fastforward.type_common` — reference `src/fastforward/__init__.py`).
_SUBMODULE_ALIASES = {
    "affine": "fastforward_tpu.quantization.affine_function",
    "granularity": "fastforward_tpu.quantization.granularity",
    "random": "fastforward_tpu.quantization.random",
    "logging_utils": "fastforward_tpu.utils.logging_utils",
    "dataclasses": "fastforward_tpu.utils.dataclasses",
    "type_common": "fastforward_tpu.utils.common",
}

version = "0.1.0"
__version__ = version

# Top-level convenience names resolved lazily from heavier subsystems
# (parity with the reference `fastforward` namespace: ff.quantize_model,
# ff.estimate_ranges, ff.find_quantizers, ...).
_LAZY_NAMES = {
    "quantize_model": ("fastforward_tpu.nn", "quantize_model"),
    "surrogate_quantized_module": ("fastforward_tpu.nn", "surrogate_quantized_module"),
    "named_quantizers": ("fastforward_tpu.nn", "named_quantizers"),
    "summarize_quantizers": ("fastforward_tpu.nn", "summarize_quantizers"),
    "estimate_ranges": ("fastforward_tpu.range_setting", "estimate_ranges"),
    "find_quantizers": ("fastforward_tpu.quant_init", "find_quantizers"),
    "QuantizationConfig": ("fastforward_tpu.quant_init", "QuantizationConfig"),
    "disable_quantization": ("fastforward_tpu.overrides", "disable_quantization"),
    "enable_quantization": ("fastforward_tpu.overrides", "enable_quantization"),
    "sqnr": ("fastforward_tpu.utils.metrics", "sqnr"),
    "autoquantize": ("fastforward_tpu.autoquant", "autoquantize"),
    "PatternRule": ("fastforward_tpu.autoquant", "PatternRule"),
    "trace_quantization_sites": (
        "fastforward_tpu.autoquant_jaxpr", "trace_quantization_sites",
    ),
    "JaxprQuantizationPlan": (
        "fastforward_tpu.autoquant_jaxpr", "JaxprQuantizationPlan",
    ),
    "freeze_parameters": ("fastforward_tpu.quantization.freeze", "freeze_parameters"),
    "strict_quantization_for_module": (
        "fastforward_tpu.quantization.strict_quantization",
        "strict_quantization_for_module",
    ),
    "annotate_operator_metadata": (
        "fastforward_tpu.quantization.quantizer_annotations",
        "annotate_operator_metadata",
    ),
    "random_quantized": ("fastforward_tpu.quantization.random", "random_quantized"),
    "QuantizedTensor": ("fastforward_tpu.quantization.quantized_array", "QuantizedArray"),
    "quantized_module_map": ("fastforward_tpu.nn", "quantized_module_map"),
    "surrogate_quantized_modules": ("fastforward_tpu.nn", "surrogate_quantized_modules"),
    "sdpa_upcast": ("fastforward_tpu.ops.sdpa", "sdpa_upcast"),
    "layerwise_optimize": ("fastforward_tpu.algorithms", "layerwise_optimize"),
    "gptq": ("fastforward_tpu.algorithms", "gptq"),
}


def __getattr__(name):
    import importlib

    if name in _LAZY_SUBMODULES:
        return importlib.import_module(f"fastforward_tpu.{name}")
    if name in _SUBMODULE_ALIASES:
        return importlib.import_module(_SUBMODULE_ALIASES[name])
    if name in _LAZY_NAMES:
        module_name, attr = _LAZY_NAMES[name]
        return getattr(importlib.import_module(module_name), attr)
    raise AttributeError(f"module 'fastforward_tpu' has no attribute {name!r}")
