"""Min-max range estimators.

Parity: reference `src/fastforward/range_setting/minmax.py` —
`SmoothedMinMaxEstimator` (EMA of per-tile min/max, :26-177) and
`RunningMinMaxEstimator` (running min/max over batches, :179-300), with the
`smoothed_minmax` / `running_minmax` aliases.

The per-batch reductions are jitted jnp reductions over the quantizer's tile
grid — on TPU a single fused VPU pass per quantizer call.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fastforward_tpu.quantization import tiling
from fastforward_tpu.range_setting.common import (
    SimpleEstimatorStep,
    _StepEstimator,
)


def _tile_min_max(data: jax.Array, granularity) -> tuple[jax.Array, jax.Array]:
    from fastforward_tpu.quantization.quantized_array import QuantizedArray

    if isinstance(data, QuantizedArray):
        data = data.dequantize()
    tile = tiling.resolve_tile_size(granularity.tile_size(data.shape), data.shape)
    tiled = data.reshape(tiling.interleaved_shape(data.shape, tile))
    axes = tuple(range(1, tiled.ndim, 2))
    return jnp.min(tiled, axis=axes).reshape(-1), jnp.max(tiled, axis=axes).reshape(-1)


class SmoothedMinMaxEstimatorStep(SimpleEstimatorStep):
    """EMA of per-tile min/max: ``running = γ·running + (1-γ)·batch``.

    Parity: reference `minmax.py:26-101`.
    """

    def __init__(self, quantizer, gamma: float = 0.9, disable_quantization: bool = False):
        super().__init__(quantizer, disable_quantization)
        self.gamma = gamma
        self._min: Optional[jax.Array] = None
        self._max: Optional[jax.Array] = None

    def estimate_step(self, data: Any) -> None:
        batch_min, batch_max = _tile_min_max(data, self.quantizer.granularity)
        if self._min is None:
            self._min, self._max = batch_min, batch_max
        else:
            g = self.gamma
            self._min = g * self._min + (1 - g) * batch_min
            self._max = g * self._max + (1 - g) * batch_max
        self.quantizer.quantization_range = (self._min, self._max)


class RunningMinMaxEstimatorStep(SimpleEstimatorStep):
    """Global min/max across all observed batches.

    Parity: reference `minmax.py:179-249`.
    """

    def __init__(self, quantizer, disable_quantization: bool = False):
        super().__init__(quantizer, disable_quantization)
        self._min: Optional[jax.Array] = None
        self._max: Optional[jax.Array] = None

    def estimate_step(self, data: Any) -> None:
        batch_min, batch_max = _tile_min_max(data, self.quantizer.granularity)
        if self._min is None:
            self._min, self._max = batch_min, batch_max
        else:
            self._min = jnp.minimum(self._min, batch_min)
            self._max = jnp.maximum(self._max, batch_max)
        self.quantizer.quantization_range = (self._min, self._max)


class SmoothedMinMaxRangeEstimator(_StepEstimator):
    def __init__(self, gamma: float = 0.9, disable_quantization: bool = False):
        super().__init__(
            SmoothedMinMaxEstimatorStep,
            gamma=gamma,
            disable_quantization=disable_quantization,
        )


class RunningMinMaxRangeEstimator(_StepEstimator):
    def __init__(self, disable_quantization: bool = False):
        super().__init__(
            RunningMinMaxEstimatorStep, disable_quantization=disable_quantization
        )


# Aliases (reference `minmax.py` bottom).
smoothed_minmax = SmoothedMinMaxRangeEstimator
running_minmax = RunningMinMaxRangeEstimator
