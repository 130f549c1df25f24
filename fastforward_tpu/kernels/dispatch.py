"""Dispatcher registrations for the execution-tier kernels.

Closes the loop described in SURVEY §7: when a `QuantizedArray` with true
low-bit storage reaches `ops.linear`, the dispatcher routes to the fused
kernel instead of the dequantize fallback — the jit-traced analog of the
reference's predicate dispatch to CUDA kernels.

Predicates match at trace time on storage dtype + granularity:
  - weight int8-stored, per-channel(1) symmetric → `matmul_w8a8` with
    dynamic per-token activation quantization;
  - (packed int4 weights live in `serving.QuantLinear`, which calls the W4
    kernels directly — packed storage has no faithful QuantizedArray shape.)
"""

from typing import Any, Optional

import jax.numpy as jnp

from fastforward_tpu import dispatcher
from fastforward_tpu.dispatcher import Predicate
from fastforward_tpu.kernels.matmul import matmul_w8a8, quantize_rowwise
from fastforward_tpu.quantization.affine_function import StaticAffineQuantParams
from fastforward_tpu.quantization.granularity import PerChannel
from fastforward_tpu.quantization.quantized_array import QuantizedArray


def _int8_per_channel_weight(value: Any) -> bool:
    if not isinstance(value, QuantizedArray):
        return False
    if value.raw_data.dtype != jnp.int8 or value.ndim != 2:
        return False
    params = value.quant_args()
    if not isinstance(params, StaticAffineQuantParams) or params.offset is not None:
        return False
    return isinstance(params.granularity, PerChannel) and params.granularity.channel_dims == (1,)


def _linear_w8a8_predicate(input: Any, kernel: Any, bias: Any = None, **kwargs: Any) -> bool:
    if not _int8_per_channel_weight(kernel):
        return False
    # input: dense array or QuantizedArray both fine (dense → dynamic quant)
    x = input.dequantize() if isinstance(input, QuantizedArray) else input
    return hasattr(x, "ndim") and x.ndim >= 2


@dispatcher.register(
    "linear", predicate=Predicate(_linear_w8a8_predicate, name="w8a8_int8_weight")
)
def _linear_w8a8_kernel(input: Any, kernel: QuantizedArray, bias: Optional[Any] = None,
                        *, output_quantizer: Any = None) -> Any:
    x = input.dequantize() if isinstance(input, QuantizedArray) else input
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    x_q, x_scale = quantize_rowwise(x2)
    w_scale = jnp.asarray(kernel.quant_args().scale, jnp.float32).reshape(-1)
    out = matmul_w8a8(
        x_q, x_scale, kernel.raw_data, w_scale,
        bias=None if bias is None else (
            bias.dequantize() if isinstance(bias, QuantizedArray) else bias
        ),
        out_dtype=jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32,
    )
    out = out.reshape(*lead, -1)
    if output_quantizer is not None and not getattr(output_quantizer, "is_stub", False):
        return output_quantizer(out)
    return out
