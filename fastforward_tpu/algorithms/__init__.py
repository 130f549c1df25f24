from fastforward_tpu.algorithms.gptq import (
    calculate_hessian,
    gptq,
    gptq_quantize,
    invert_hessian,
)
from fastforward_tpu.algorithms.layerwise import (
    layerwise_optimize,
    layerwise_optimize_staged,
)

__all__ = [
    "gptq",
    "gptq_quantize",
    "calculate_hessian",
    "invert_hessian",
    "layerwise_optimize",
    "layerwise_optimize_staged",
]
