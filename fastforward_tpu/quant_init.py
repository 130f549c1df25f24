"""Quantizer discovery and rule-based initialization.

Parity: reference `src/fastforward/quantization/quant_init.py` —
`find_quantizers(model, query)` (:214), the `[quantizer:<tag>]` fragment
(:22-69), and `QuantizationConfig` with precedence-ordered rules and
overwrite policies (:277-389).
"""

from typing import Any, Callable, Optional, Union

from fastforward_tpu import mpath
from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.mpath.search import MPathCollection, MPathItem
from fastforward_tpu.nn.quantizer import Quantizer, QuantizerStub

QuantizerFactory = Callable[..., Quantizer]


class QuantizerCollection(MPathCollection):
    """MPathCollection of quantizer slots with batch initialization.

    Parity: reference `QuantizerCollection` (`quant_init.py:118-213`).
    """

    def initialize(
        self,
        quantizer_factory: Union[type, QuantizerFactory],
        overwrite_policy: str = "overwrite",
        **kwargs: Any,
    ) -> None:
        """Replace every matched stub with ``quantizer_factory(**kwargs)``.

        ``overwrite_policy`` (parity reference `quant_init.py:72-101`):
          - "error": raise if the slot holds a non-stub quantizer;
          - "skip": leave non-stub quantizers untouched;
          - "overwrite": always replace.
        """
        for item in list(self):
            new = _initialize_quantizer(item, quantizer_factory, overwrite_policy, kwargs)
            if new is not None:
                item.update_module(new)


def _initialize_quantizer(
    item: MPathItem,
    factory: Union[type, QuantizerFactory],
    overwrite_policy: str,
    kwargs: dict[str, Any],
) -> Optional[Quantizer]:
    current = item.module
    if not isinstance(current, QuantizerStub):
        if overwrite_policy == "error":
            raise QuantizationError(
                f"Quantizer at '{item.full_name}' is already initialized "
                f"({type(current).__name__}) and overwrite_policy='error'."
            )
        if overwrite_policy == "skip":
            return None
    quantizer = factory(**kwargs)
    if not isinstance(quantizer, Quantizer):
        raise TypeError(
            f"Quantizer factory returned {type(quantizer).__name__}, expected a Quantizer"
        )
    # Preserve slot metadata from the stub (tags describing the slot kind).
    if getattr(current, "quant_metadata", None) is not None:
        quantizer.quant_metadata = current.quant_metadata
    return quantizer


def find_quantizers(
    model: Any, query: Any, context: Optional[dict[str, Any]] = None
) -> QuantizerCollection:
    """Find quantizer slots matching an mpath query.

    The query addresses the *quantizer modules themselves*; a trailing
    ``[quantizer:tag]`` fragment filters by slot tags, e.g.
    ``"**/[quantizer:parameter/weight]"``. Parity: reference
    `quant_init.py:214-276`.
    """
    results = mpath.search(query, model, context=context)
    return QuantizerCollection([i for i in results if isinstance(i.module, Quantizer)])


class QuantizationConfig:
    """Declarative quantizer placement: ordered (query, factory) rules.

    Later rules take precedence (reference `quant_init.py:277-389` scores by
    insertion order). `initialize(model)` applies the highest-precedence rule
    to every quantizer slot it matches.
    """

    def __init__(self) -> None:
        self._rules: list[tuple[Any, Union[type, QuantizerFactory], dict[str, Any]]] = []

    def add_rule(
        self,
        query: Any,
        quantizer_factory: Union[type, QuantizerFactory],
        **kwargs: Any,
    ) -> "QuantizationConfig":
        self._rules.append((query, quantizer_factory, kwargs))
        return self

    def initialize(
        self,
        model: Any,
        overwrite_policy: str = "overwrite",
        context: Optional[dict[str, Any]] = None,
    ) -> None:
        # Apply rules in order; later rules overwrite earlier matches, which
        # realizes last-wins precedence without explicit scoring.
        for query, factory, kwargs in self._rules:
            collection = find_quantizers(model, query, context=context)
            policy = overwrite_policy if overwrite_policy != "overwrite" else "overwrite"
            collection.initialize(factory, overwrite_policy=policy, **kwargs)
