"""Operator-metadata annotation for quantizers.

Parity: reference `src/fastforward/quantization/quantizer_annotations.py:14-99`
— run one sample forward and record, for each quantizer, which operator
produced/consumed its data (used by export metadata).

The reference needs a `__torch_function__` TraceTensor subclass; here the
producing op is observed at the op layer: during the annotation forward,
every quantized op reports itself to a recorder, and each quantizer override
tags its quantizer with the op that ran last.
"""

import contextlib
from contextvars import ContextVar
from typing import Any, Iterator, Optional

from fastforward_tpu.nn.quantized_module import named_quantizers
from fastforward_tpu.nn.quantizer import Quantizer

_LAST_OP: ContextVar[Optional[str]] = ContextVar("annotation_last_op", default=None)
_ACTIVE: ContextVar[bool] = ContextVar("annotation_active", default=False)


def record_op(op_name: str) -> None:
    """Called by the op layer when an operator executes (annotation mode)."""
    if _ACTIVE.get():
        _LAST_OP.set(op_name)


# Register as an op observer once.
from fastforward_tpu.ops import optable as _optable  # noqa: E402

if record_op not in _optable.OP_OBSERVERS:
    _optable.OP_OBSERVERS.append(record_op)


class _AnnotationOverride:
    def __init__(self, quantizer: Quantizer):
        self.quantizer = quantizer

    def __call__(self, context, overridden_fn, args, kwargs):
        op = _LAST_OP.get()
        if op is not None and self.quantizer.quant_metadata is not None:
            self.quantizer.quant_metadata = self.quantizer.quant_metadata.with_extras(
                producing_operator=op
            )
        elif op is not None:
            from fastforward_tpu.nn.quantizer import QuantizerMetadata

            meta = QuantizerMetadata()
            meta.producing_operator = op  # type: ignore[attr-defined]
            self.quantizer.quant_metadata = meta
        return overridden_fn(*args, **kwargs)


@contextlib.contextmanager
def _annotation_mode() -> Iterator[None]:
    token = _ACTIVE.set(True)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def annotate_operator_metadata(model: Any, *sample_args: Any, **sample_kwargs: Any) -> None:
    """Run one forward and tag each quantizer's metadata with the operator
    that fed it (``quant_metadata.producing_operator``)."""
    from fastforward_tpu import flags

    handles = []
    for _, quantizer in named_quantizers(model, remove_duplicate=True):
        handles.append(quantizer.register_override(_AnnotationOverride(quantizer)))
    try:
        with _annotation_mode(), flags.strict_quantization(False):
            model(*sample_args, **sample_kwargs)
    finally:
        for handle in handles:
            handle.remove()
