"""Quantizer initialization helpers for tests.

Parity: reference `testing/initialization.py:16`
(`initialize_quantizers_to_linear_quantizer`).
"""

from typing import Any, Optional

from fastforward_tpu.nn.linear_quantizer import LinearQuantizer
from fastforward_tpu.nn.quantized_module import QuantizedModule
from fastforward_tpu.quantization.granularity import Granularity


def initialize_quantizers_to_linear_quantizer(
    model: Any,
    num_bits: int = 8,
    granularity: Optional[Granularity] = None,
    symmetric: bool = False,
    default_range: tuple = (-4.0, 4.0),
) -> None:
    """Replace every quantizer stub with an initialized LinearQuantizer."""
    from flax import nnx

    for _, module in nnx.iter_modules(model):
        if not isinstance(module, QuantizedModule):
            continue
        for name, q in list(module.named_quantizers()):
            lq = LinearQuantizer(
                num_bits=num_bits, granularity=granularity, symmetric=symmetric
            )
            lq.quantization_range = default_range
            if q.quant_metadata is not None:
                lq.quant_metadata = q.quant_metadata
            setattr(module, name, lq)
