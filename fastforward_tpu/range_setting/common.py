"""Range estimation framework.

Parity: reference `src/fastforward/range_setting/common.py` — the
`RangeSettable` / `SupportsRangeBasedOperator` protocols (:30-111), the
`RangeEstimator` ABC (:118-174), `SimpleEstimatorStep` (estimator attached as
a quantizer override, :180-238) and the `estimate_ranges` context manager
(:241-289).
"""

import abc
import contextlib
from typing import Any, Callable, Iterator, Protocol, runtime_checkable

from fastforward_tpu.forward_override import OverrideHandle
from fastforward_tpu.nn.quantized_module import named_quantizers
from fastforward_tpu.nn.quantizer import Quantizer, QuantizerStub


@runtime_checkable
class RangeSettable(Protocol):
    """A quantizer whose range can be read/written.

    Parity: reference `common.py:30-65`.
    """

    granularity: Any

    @property
    def quantization_range(self) -> tuple: ...

    @quantization_range.setter
    def quantization_range(self, value: tuple) -> None: ...


@runtime_checkable
class SupportsRangeBasedOperator(Protocol):
    """A quantizer that can produce a quantization operator for a candidate
    range without mutating its state (used by grid search).

    Parity: reference `common.py:69-111`.
    """

    def operator_for_range(self, min_range, max_range, data_shape) -> Any: ...


class RangeEstimator(abc.ABC):
    """Per-quantizer range estimation strategy.

    `split_module` selects the quantizers to estimate; `prepare` attaches the
    estimation step to one quantizer; `cleanup` detaches it.
    Parity: reference `common.py:118-174`.
    """

    def split_module(self, model: Any) -> Iterator[Quantizer]:
        for _, quantizer in named_quantizers(model):
            if isinstance(quantizer, QuantizerStub):
                continue
            if isinstance(quantizer, RangeSettable):
                yield quantizer

    @abc.abstractmethod
    def prepare(self, quantizer: Quantizer) -> OverrideHandle: ...

    def cleanup(self, handles: list[OverrideHandle]) -> None:
        for handle in handles:
            handle.remove()


class SimpleEstimatorStep(abc.ABC):
    """An estimator step installed as a quantizer override: observes the data,
    updates the quantizer's range, then runs the (possibly disabled)
    quantization. Parity: reference `common.py:180-238`.
    """

    def __init__(self, quantizer: Quantizer, disable_quantization: bool = False):
        self.quantizer = quantizer
        self.disable_quantization = disable_quantization

    @abc.abstractmethod
    def estimate_step(self, data: Any) -> None:
        """Observe one batch and update ``self.quantizer``'s range."""

    def __call__(self, context, overridden_fn, args, kwargs):
        data = args[0]
        self.estimate_step(data)
        if self.disable_quantization:
            return data
        return overridden_fn(*args, **kwargs)


class _StepEstimator(RangeEstimator):
    """RangeEstimator installing a `SimpleEstimatorStep` per quantizer."""

    step_cls: type[SimpleEstimatorStep]

    def __init__(self, step_cls: type[SimpleEstimatorStep], **step_kwargs: Any):
        self._step_cls = step_cls
        self._step_kwargs = step_kwargs

    def make_step(self, quantizer: Quantizer) -> SimpleEstimatorStep:
        """Public step construction — the API non-module consumers (e.g. the
        jaxpr autoquant plan) use instead of reaching into the private
        `_step_cls`/`_step_kwargs` attributes."""
        return self._step_cls(quantizer, **self._step_kwargs)

    def prepare(self, quantizer: Quantizer) -> OverrideHandle:
        return quantizer.register_override(self.make_step(quantizer))


def step_factory(estimator: Any = None):
    """Resolve any estimator spec to ``callable(quantizer) -> step``.

    Accepts the same shapes `estimate_ranges` does — ``None`` (default
    running-minmax), a `SimpleEstimatorStep` subclass, a `_StepEstimator`
    factory or instance (`running_minmax`, `smoothed_minmax`,
    `min_error_grid`, ...). The single public estimator-step API shared by
    the module path and the jaxpr-plan path.
    """
    if estimator is None:
        from fastforward_tpu.range_setting.minmax import (
            RunningMinMaxEstimatorStep,
        )

        return RunningMinMaxEstimatorStep
    if isinstance(estimator, type) and issubclass(estimator, SimpleEstimatorStep):
        return estimator
    inst = estimator() if isinstance(estimator, type) else estimator
    if isinstance(inst, _StepEstimator):
        return inst.make_step
    raise TypeError(f"unsupported estimator {estimator!r}")


@contextlib.contextmanager
def estimate_ranges(
    model: Any,
    estimator: Callable[..., RangeEstimator] | RangeEstimator,
    **estimator_kwargs: Any,
) -> Iterator[RangeEstimator]:
    """Attach a range estimator to every quantizer of ``model`` for the
    duration of the context; run calibration batches inside.

        with ff.estimate_ranges(model, ff.range_setting.smoothed_minmax):
            for batch in data:
                model(batch)

    Parity: reference `common.py:241-289`.
    """
    if not isinstance(estimator, RangeEstimator):
        estimator = estimator(**estimator_kwargs)
    handles: list[OverrideHandle] = []
    try:
        for quantizer in estimator.split_module(model):
            handles.append(estimator.prepare(quantizer))
        yield estimator
    finally:
        estimator.cleanup(handles)
