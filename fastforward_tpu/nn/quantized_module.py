"""QuantizedModule system: conversion of NNX models to quantized counterparts.

Parity: reference `src/fastforward/nn/quantized_module.py` — subclass
auto-registration into a global module map (:102-201), conversion by
``__class__`` reassignment (:831-853), `quantize_model` (:780-828),
`surrogate_quantized_modules` (:711-777), `named_quantizers` iterators and
`summarize_quantizers` (:930-998).

Works on any flax NNX model: quantized counterparts are registered against
the *original* NNX module type; conversion walks the module graph and swaps
classes in place (NNX modules are plain Python objects, so the reference's
class-reassignment trick carries over directly and preserves parameter
identity/sharding).
"""

import contextlib
from contextvars import ContextVar
from typing import Any, Callable, Iterator, Optional

from flax import nnx

from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.nn.quantizer import Quantizer, QuantizerStub

# Sentinel: map a module type to SKIP_QUANTIZATION to leave it untouched.
SKIP_QUANTIZATION = object()

_QUANTIZED_MODULE_MAP: dict[type, type] = {}


class QuantizedModule(nnx.Module):
    """Mixin marking a module as the quantized counterpart of a base type.

    Subclasses inherit from both `QuantizedModule` and an NNX module type;
    they implement `__init_quantization__` to create their quantizer slots
    (as `QuantizerStub`s) and a `__call__` that routes through
    `fastforward_tpu.ops`.

    Derives from nnx.Module (with empty slots) so converted instances keep an
    identical CPython object layout — required for conversion by ``__class__``
    reassignment.
    """

    __slots__ = ()

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        # Auto-register against the nearest non-Quantized NNX base
        # (reference `quantized_module.py:102-134`).
        for base in cls.__mro__[1:]:
            if base in (QuantizedModule, nnx.Module, object):
                continue
            if issubclass(base, QuantizedModule):
                continue
            if issubclass(base, nnx.Module):
                _QUANTIZED_MODULE_MAP.setdefault(base, cls)
                break

    def __init_quantization__(self) -> None:
        """Create quantizer stubs. Subclasses extend."""
        self._quantization_initialized = True

    # -- quantizer iteration (reference :45-79,307) ------------------------

    def named_quantizers(
        self, prefix: str = "", recurse: bool = False
    ) -> Iterator[tuple[str, Quantizer]]:
        if recurse:
            yield from named_quantizers(self, prefix=prefix)
            return
        for name, value in vars(self).items():
            if isinstance(value, Quantizer):
                yield (f"{prefix}{name}" if prefix else name), value

    @property
    def quantizers(self) -> list[Quantizer]:
        return [q for _, q in self.named_quantizers()]


def quantized_module_map() -> dict[type, type]:
    """The global {module type -> quantized counterpart} map.

    Parity: reference `quantized_module.py:856-883`. An active
    `filter_quantized_module_map` context narrows the returned view.
    """
    mapping = dict(_QUANTIZED_MODULE_MAP)
    for predicate in _MAP_FILTERS.get():
        mapping = {b: q for b, q in mapping.items() if predicate(b, q)}
    return mapping


_MAP_FILTERS: "ContextVar[tuple]" = ContextVar("quantized_module_map_filters", default=())


@contextlib.contextmanager
def filter_quantized_module_map(
    predicate: Callable[[type, type], bool],
) -> Iterator[None]:
    """Scope `quantized_module_map` (and so `quantize_model`) to entries
    passing ``predicate(base_type, quantized_type)``.

    Parity: reference `filter_quantized_module_map`
    (`quantized_module.py:886-906`) — used to exclude counterparts during a
    conversion without unregistering them globally.
    """
    token = _MAP_FILTERS.set(_MAP_FILTERS.get() + (predicate,))
    try:
        yield
    finally:
        _MAP_FILTERS.reset(token)


def register_quantized_module(
    base: type, quantized: Optional[type] = None
) -> Any:
    """Register (or decorate) a quantized counterpart for ``base``."""
    if quantized is None:

        def decorator(cls: type) -> type:
            _QUANTIZED_MODULE_MAP[base] = cls
            return cls

        return decorator
    _QUANTIZED_MODULE_MAP[base] = quantized
    return quantized


def _has_direct_params(module: nnx.Module) -> bool:
    return any(isinstance(v, nnx.Variable) for v in vars(module).values())


_SURROGATES: dict[type, type] = {}


def surrogate_quantized_module(base: type) -> type:
    """Generate a pass-through QuantizedModule subclass for ``base``.

    Parity: reference `surrogate_quantized_modules`
    (`quantized_module.py:711-777`): the surrogate adds no quantizers; it
    only marks the module as converted so children are still reachable.
    """
    if base in _SURROGATES:
        return _SURROGATES[base]
    surrogate = type(f"Quantized{base.__name__}", (QuantizedModule, base), {})
    # Surrogates should not claim the global map slot for their base type.
    if _QUANTIZED_MODULE_MAP.get(base) is surrogate:
        del _QUANTIZED_MODULE_MAP[base]
    _SURROGATES[base] = surrogate
    return surrogate


def surrogate_quantized_modules(
    model: nnx.Module,
    *,
    extra_conversion: Optional[dict[type, type]] = None,
    ignore_global_module_map: bool = False,
) -> dict[type, type]:
    """Conversion dict of pass-through surrogates for every submodule type of
    ``model`` without a quantized counterpart.

    Parity: reference `surrogate_quantized_modules`
    (`nn/quantized_module.py:711-777`) — the result can be passed as
    ``extra_conversion`` to `quantize_model` so conversion always succeeds;
    surrogates add no quantizers and leave the forward untouched.
    """
    known: dict[type, type] = {} if ignore_global_module_map else dict(
        quantized_module_map()
    )
    if extra_conversion:
        known.update(extra_conversion)
    out: dict[type, type] = {}
    for _, module in _iter_submodules(model):
        t = type(module)
        if isinstance(module, (QuantizedModule, Quantizer)):
            continue
        if t in known or t in out:
            continue
        out[t] = surrogate_quantized_module(t)
    return out


def _iter_submodules(module: nnx.Module) -> Iterator[tuple[tuple, nnx.Module]]:
    yield from nnx.iter_modules(module)


def check_quantizable(
    model: nnx.Module, module_map: dict[type, type], allow_surrogates: bool
) -> None:
    """Raise QuantizationError listing module types with parameters that have
    no quantized counterpart. Parity: reference `quantized_module.py:665-708`.
    """
    missing: set[str] = set()
    for _, module in _iter_submodules(model):
        t = type(module)
        if isinstance(module, (QuantizedModule, Quantizer)):
            continue
        if t in module_map:
            continue
        if not _has_direct_params(module) and allow_surrogates:
            continue
        missing.add(f"{t.__module__}.{t.__qualname__}")
    if missing:
        raise QuantizationError(
            "No quantized counterpart registered for module types with "
            f"parameters: {sorted(missing)}. Register one with "
            "register_quantized_module(...), pass extra_conversion={...}, or "
            "map them to SKIP_QUANTIZATION."
        )


def quantize_model(
    model: nnx.Module,
    *,
    extra_conversion: Optional[dict[type, Any]] = None,
    skip_quantized_modules: bool = True,
    allow_surrogates: bool = True,
    _quantize_self: bool = True,
) -> nnx.Module:
    """Convert ``model`` (in place) to its quantized form.

    Every submodule whose type has a registered counterpart gets its class
    swapped and `__init_quantization__` called (installing `QuantizerStub`
    slots); parameter-free modules without a counterpart get pass-through
    surrogates. Returns the model for chaining.

    Parity: reference `quantize_model` (`quantized_module.py:780-853`).
    """
    module_map = quantized_module_map()
    if extra_conversion:
        module_map.update({k: v for k, v in extra_conversion.items()})

    check_quantizable(model, module_map, allow_surrogates)

    for _, module in list(_iter_submodules(model)):
        if module is model and not _quantize_self:
            continue
        if isinstance(module, Quantizer):
            continue
        if isinstance(module, QuantizedModule):
            if skip_quantized_modules:
                continue
        t = type(module)
        target = module_map.get(t)
        if target is SKIP_QUANTIZATION:
            continue
        if target is None:
            if isinstance(module, QuantizedModule):
                continue
            target = surrogate_quantized_module(t)
        module.__class__ = target
        module.__init_quantization__()
    return model


# --- quantizer iteration over whole models -----------------------------------


def named_quantizers(
    model: nnx.Module, prefix: str = "", remove_duplicate: bool = False
) -> Iterator[tuple[str, Quantizer]]:
    """Yield (path, quantizer) for every Quantizer in the module tree.

    Unlike `nnx.iter_modules`, a quantizer shared between several slots is
    yielded at *every* path (``remove_duplicate=False``, matching the
    reference's shared-quantizer handling in state save/load,
    `quantized_module.py:363-652`).
    """
    seen: set[int] = set()

    def walk(obj: Any, path: tuple[str, ...], on_path: set[int]):
        if id(obj) in on_path:
            return  # cycle guard
        if isinstance(obj, Quantizer):
            if remove_duplicate:
                if id(obj) in seen:
                    return
                seen.add(id(obj))
            name = "/".join(path)
            yield (f"{prefix}{name}" if prefix else name), obj
            return
        children: list[tuple[str, Any]] = []
        if isinstance(obj, (list, tuple, nnx.List)):
            children = [(str(i), v) for i, v in enumerate(obj)]
        elif isinstance(obj, (dict, nnx.Dict)):
            children = [(str(k), v) for k, v in obj.items()]
        elif isinstance(obj, nnx.Module):
            children = [
                (k, v) for k, v in vars(obj).items() if not k.startswith("_")
            ]
        next_on_path = on_path | {id(obj)}
        for key, value in children:
            if isinstance(value, (nnx.Module, list, tuple, dict, nnx.List, nnx.Dict)):
                yield from walk(value, path + (key,), next_on_path)

    yield from walk(model, (), set())


def summarize_quantizers(model: nnx.Module) -> str:
    """Human-readable table of quantizer slots and their state.

    Parity: reference `summarize_quantizers` (`quantized_module.py:930-998`).
    """
    lines = []
    for name, q in named_quantizers(model):
        if isinstance(q, QuantizerStub):
            state = "stub"
        elif getattr(q, "has_uninitialized_params", False):
            state = f"{type(q).__name__} (uninitialized)"
        else:
            state = type(q).__name__
            extra = getattr(q, "extra_repr", None)
            if extra:
                state += f"({extra()})"
        lines.append(f"{name}: {state}")
    return "\n".join(lines)
