"""Freeze quantized parameters.

Parity: reference `src/fastforward/quantization/freeze.py:14-100` —
`freeze_parameters` bakes each weight quantizer's quantization into the
stored parameter (quantize→dequantize once) and short-circuits the quantizer
afterwards, so repeated forward passes skip the QDQ work.

The execution-tier big sibling of this is `serving.engine.freeze_llama`,
which freezes into true low-bit storage; this one stays in the simulation
tier (dequantized weights, reference semantics).
"""

from typing import Any


from fastforward_tpu.forward_override import OverrideHandle
from fastforward_tpu.nn.quantized_module import QuantizedModule
from fastforward_tpu.nn.quantizer import QuantizerStub
from fastforward_tpu.quantization.quantized_array import QuantizedArray


class _FrozenPassthrough:
    """Override that skips quantization (the data is already on-grid)."""

    def __call__(self, context, overridden_fn, args, kwargs):
        return args[0]


def freeze_parameters(model: Any) -> list[OverrideHandle]:
    """Quantize-dequantize every weight/bias parameter once, store the result
    back into the module, and disable the corresponding quantizers.

    Returns the override handles (remove them to unfreeze).
    """
    from flax import nnx as _nnx

    handles: list[OverrideHandle] = []
    # Walk modules; for each QuantizedModule with weight/bias quantizers and
    # matching parameters, bake the quantization in.
    for _, module in list(_iter_quantized_modules(model)):
        for attr, qname in (("kernel", "weight_quantizer"), ("bias", "bias_quantizer"),
                            ("embedding", "weight_quantizer"), ("scale", "weight_quantizer")):
            quantizer = getattr(module, qname, None)
            param = getattr(module, attr, None)
            if quantizer is None or isinstance(quantizer, QuantizerStub):
                continue
            if param is None or not isinstance(param, _nnx.Param):
                continue
            if getattr(quantizer, "has_uninitialized_params", False):
                continue
            out = quantizer(param.value)
            baked = out.dequantize() if isinstance(out, QuantizedArray) else out
            setattr(module, attr, _nnx.Param(baked))
            handles.append(quantizer.register_override(_FrozenPassthrough()))
    return handles


def _iter_quantized_modules(model: Any):
    from flax import nnx as _nnx

    for path, module in _nnx.iter_modules(model):
        if isinstance(module, QuantizedModule):
            yield path, module


def unfreeze(handles: list[OverrideHandle]) -> None:
    for handle in handles:
        handle.remove()
