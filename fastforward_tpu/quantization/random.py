"""Random quantized arrays for tests and prototyping.

Parity: reference `src/fastforward/quantization/random.py:13`.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fastforward_tpu.quantization.affine_function import quantize_per_granularity
from fastforward_tpu.quantization.granularity import Granularity, PerTensor
from fastforward_tpu.quantization.quantized_array import QuantizedArray


def random_quantized(
    shape: tuple[int, ...],
    *,
    key: Optional[jax.Array] = None,
    num_bits: int = 8,
    granularity: Optional[Granularity] = None,
    scale: float = 0.02,
    offset: Optional[float] = None,
    quantized_dtype: Any = None,
) -> QuantizedArray:
    """Generate a QuantizedArray with random on-grid data."""
    key = key if key is not None else jax.random.PRNGKey(0)
    granularity = granularity or PerTensor()
    data = jax.random.normal(key, shape, jnp.float32)
    n = granularity.parameter_dimensionality(shape)
    scale_arr = jnp.full((n,), scale, jnp.float32)
    offset_arr = None if offset is None else jnp.full((n,), offset, jnp.float32)
    return quantize_per_granularity(
        data, granularity, scale_arr, offset_arr,
        num_bits=num_bits, quantized_dtype=quantized_dtype,
    )
