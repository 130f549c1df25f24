"""Static and dynamic affine quantizer modules.

Parity: reference `src/fastforward/nn/linear_quantizer.py:25-357` and
`src/fastforward/nn/dynamic_linear_quantizer.py:20`.

Lazy parameters: the reference uses `torch.nn.UninitializedParameter` until a
range is set. JAX has no uninitialized arrays, so the scale/offset attributes
hold ``None`` until `quantization_range` is assigned (two-phase setup); using
the quantizer before that raises. `initialize_from_data` provides the
abstract-eval shortcut (min/max of a sample batch).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.quantization import affine
from fastforward_tpu.quantization.affine_function import (
    AffineQuantizationFunction,
    DynamicAffineQuantParams,
    StaticAffineQuantParams,
)
from fastforward_tpu.quantization.function import QuantizationContext
from fastforward_tpu.quantization.granularity import Granularity, PerTensor
from fastforward_tpu.nn.quantizer import Quantizer


class LinearQuantizer(Quantizer):
    """Static affine quantizer with learnable scale (and offset if asymmetric).

    Parity: reference `nn/linear_quantizer.py:120-357`:
      - symmetric (non-one-sided): offset is None;
      - symmetric one-sided: offset is a fixed (non-learnable) constant;
      - asymmetric: offset is a learnable parameter.
    """

    def __init__(
        self,
        num_bits: int,
        *,
        granularity: Optional[Granularity] = None,
        symmetric: bool = True,
        allow_one_sided: bool = True,
        quantized_dtype: Any = None,
    ):
        super().__init__()
        self.num_bits = num_bits
        self.granularity = granularity or PerTensor()
        self.symmetric = symmetric
        self.allow_one_sided = allow_one_sided
        self.quantized_dtype = quantized_dtype
        # Lazy parameters: declared as nnx *data* slots so that materializing
        # them later (assigning nnx.Param) is a data->data update.
        self.scale: Optional[nnx.Param] = nnx.data(None)
        self.offset: Optional[nnx.Param] = nnx.data(None)
        self._one_sided = False

    # -- RangeSettable protocol (reference `range_setting/common.py:30-65`) --

    @property
    def has_uninitialized_params(self) -> bool:
        return self.scale is None

    @property
    def quantization_range(self):
        """The (min, max) range currently represented. Raises if lazy."""
        if self.scale is None:
            raise QuantizationError(
                "Quantizer range was not set; assign quantization_range or run "
                "range estimation first."
            )
        offset = None if self.offset is None else self.offset.value
        return affine.quantization_range(self.scale.value, offset, self.num_bits)

    @quantization_range.setter
    def quantization_range(self, range_: tuple) -> None:
        min_range, max_range = range_
        min_range = jnp.asarray(min_range, dtype=jnp.float32).reshape(-1)
        max_range = jnp.asarray(max_range, dtype=jnp.float32).reshape(-1)
        scale, offset = affine.parameters_for_range(
            min_range,
            max_range,
            self.num_bits,
            symmetric=self.symmetric,
            allow_one_sided=self.allow_one_sided,
        )
        self.scale = nnx.Param(scale)
        if offset is None:
            self.offset = None
            self._one_sided = False
        else:
            # One-sided (unsigned) offsets are constants, asymmetric offsets
            # learnable parameters (reference `linear_quantizer.py:162-173`);
            # both are nnx state so they checkpoint/shard uniformly — the
            # one-sided flag records non-learnability.
            self.offset = nnx.Param(offset)
            self._one_sided = bool(self.symmetric)

    def operator_for_range(self, min_range, max_range, data_shape):
        """Return a quantize callable for a candidate range (used by MSE-grid
        search). Parity: `SupportsRangeBasedOperator`, reference
        `linear_quantizer.py:280`."""
        scale, offset = affine.parameters_for_range(
            jnp.asarray(min_range, jnp.float32).reshape(-1),
            jnp.asarray(max_range, jnp.float32).reshape(-1),
            self.num_bits,
            symmetric=self.symmetric,
            allow_one_sided=self.allow_one_sided,
        )
        params = StaticAffineQuantParams(
            scale=scale,
            offset=offset,
            num_bits=self.num_bits,
            granularity=self.granularity,
            quantized_dtype=self.quantized_dtype,
        )
        return QuantizationContext(AffineQuantizationFunction, params)

    # -- quantization --------------------------------------------------------

    def quant_context(self) -> QuantizationContext:
        if self.scale is None:
            raise QuantizationError(
                "LinearQuantizer has uninitialized parameters; set "
                "quantization_range (or run range estimation) before use."
            )
        params = StaticAffineQuantParams(
            scale=self.scale.value,
            offset=None if self.offset is None else self.offset.value,
            num_bits=self.num_bits,
            granularity=self.granularity,
            quantized_dtype=self.quantized_dtype,
        )
        return QuantizationContext(AffineQuantizationFunction, params)

    def quantize(self, data: jax.Array):
        return self.quant_context().quantize(data)

    def extra_repr(self) -> str:
        return (
            f"num_bits={self.num_bits}, granularity={self.granularity}, "
            f"symmetric={self.symmetric}"
        )


class DynamicLinearQuantizer(Quantizer):
    """Per-call min/max dynamic affine quantizer (no learned state).

    Parity: reference `nn/dynamic_linear_quantizer.py:20-95`.
    """

    def __init__(
        self,
        num_bits: int,
        *,
        granularity: Optional[Granularity] = None,
        symmetric: bool = False,
        allow_one_sided: bool = True,
        quantized_dtype: Any = None,
    ):
        super().__init__()
        self.num_bits = num_bits
        self.granularity = granularity or PerTensor()
        self.symmetric = symmetric
        self.allow_one_sided = allow_one_sided
        self.quantized_dtype = quantized_dtype

    def quantize(self, data: jax.Array):
        params = DynamicAffineQuantParams(
            num_bits=self.num_bits,
            granularity=self.granularity,
            symmetric=self.symmetric,
            allow_one_sided=self.allow_one_sided,
            quantized_dtype=self.quantized_dtype,
        )
        return AffineQuantizationFunction.quantize(data, params)
