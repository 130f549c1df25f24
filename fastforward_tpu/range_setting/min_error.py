"""MSE / minimum-error grid range estimator.

Parity: reference `src/fastforward/range_setting/min_error.py` — a candidate
grid of uniformly shrunk ranges (`_UniformSearchGrid`, :78-149), per-candidate
error accumulated across calibration batches (:171-234), argmin picked at
cleanup; `min_error_grid` / `mse_grid` aliases.

TPU note: the candidate sweep is vmapped — all candidate quantizations of a
batch evaluate in one fused program instead of a Python loop.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from fastforward_tpu.forward_override import OverrideHandle
from fastforward_tpu.nn.quantizer import Quantizer
from fastforward_tpu.quantization import tiling
from fastforward_tpu.range_setting.common import RangeEstimator, SimpleEstimatorStep
from fastforward_tpu.range_setting.minmax import _tile_min_max


def mse_error(original: jax.Array, quantized: jax.Array, tile_size) -> jax.Array:
    """Per-tile mean squared error. Parity: reference `min_error.py:64`."""
    diff = (original - quantized) ** 2
    tiled = diff.reshape(tiling.interleaved_shape(diff.shape, tile_size))
    axes = tuple(range(1, tiled.ndim, 2))
    return jnp.mean(tiled, axis=axes).reshape(-1)


def uniform_search_grid(num_candidates: int = 100, min_fraction: float = 0.1):
    """Candidate shrink factors in [min_fraction, 1].

    Parity: reference `_UniformSearchGrid` (`min_error.py:78-149`).
    """
    return jnp.linspace(min_fraction, 1.0, num_candidates)


class MinErrorEstimatorStep(SimpleEstimatorStep):
    """Parity: reference `min_error.py:171-234`."""

    def __init__(
        self,
        quantizer: Quantizer,
        num_candidates: int = 100,
        error_fn: Optional[Callable] = None,
        disable_quantization: bool = False,
    ):
        super().__init__(quantizer, disable_quantization)
        self.fractions = uniform_search_grid(num_candidates)
        self.error_fn = error_fn or mse_error
        self._min: Optional[jax.Array] = None
        self._max: Optional[jax.Array] = None
        self._errors: Optional[jax.Array] = None  # (num_candidates, num_tiles)

    def estimate_step(self, data: Any) -> None:
        from fastforward_tpu.quantization.quantized_array import QuantizedArray

        if isinstance(data, QuantizedArray):
            data = data.dequantize()

        batch_min, batch_max = _tile_min_max(data, self.quantizer.granularity)
        self._min = batch_min if self._min is None else jnp.minimum(self._min, batch_min)
        self._max = batch_max if self._max is None else jnp.maximum(self._max, batch_max)

        tile = tiling.resolve_tile_size(
            self.quantizer.granularity.tile_size(data.shape), data.shape
        )

        def candidate_error(fraction):
            ctx = self.quantizer.operator_for_range(
                self._min * fraction, self._max * fraction, data.shape
            )
            q = ctx.quantize(data)
            dq = q.dequantize() if isinstance(q, QuantizedArray) else q
            return self.error_fn(data, dq, tile)

        errors = jax.vmap(candidate_error)(self.fractions)
        self._errors = errors if self._errors is None else self._errors + errors

    def __call__(self, context, overridden_fn, args, kwargs):
        self.estimate_step(args[0])
        # The best range is only known at finalize(); until then the
        # quantizer may be uninitialized — pass data through unquantized.
        if self.disable_quantization or getattr(
            self.quantizer, "has_uninitialized_params", False
        ):
            return args[0]
        return overridden_fn(*args, **kwargs)

    def finalize(self) -> None:
        if self._errors is None:
            return
        best = jnp.argmin(self._errors, axis=0)  # per-tile best fraction index
        fraction = self.fractions[best]
        self.quantizer.quantization_range = (self._min * fraction, self._max * fraction)


class MinErrorGridRangeEstimator(RangeEstimator):
    """Parity: reference `MinErrorGridRangeEstimator` (`min_error.py:235-300`)."""

    def __init__(
        self,
        num_candidates: int = 100,
        error_fn: Optional[Callable] = None,
        disable_quantization: bool = False,
    ):
        self.num_candidates = num_candidates
        self.error_fn = error_fn
        self.disable_quantization = disable_quantization
        self._steps: list[MinErrorEstimatorStep] = []

    def prepare(self, quantizer: Quantizer) -> OverrideHandle:
        step = MinErrorEstimatorStep(
            quantizer,
            num_candidates=self.num_candidates,
            error_fn=self.error_fn,
            disable_quantization=self.disable_quantization,
        )
        self._steps.append(step)
        return quantizer.register_override(step)

    def cleanup(self, handles: list[OverrideHandle]) -> None:
        for step in self._steps:
            step.finalize()
        self._steps.clear()
        super().cleanup(handles)


# Aliases (reference `min_error.py` bottom).
min_error_grid = MinErrorGridRangeEstimator
mse_grid = MinErrorGridRangeEstimator
