"""Generic quantization-function framework.

Parity: reference `src/fastforward/quantization/function.py:23-305` —
`QuantizationParameters` dataclasses, `QuantizationFunction` ABCs and the
`QuantizationContext` that binds a function to concrete parameters and can
attach itself to data producing a `QuantizedArray`.

TPU-native design: parameter dataclasses are *registered pytrees* — array
fields (scale, offset, ...) are pytree children that flow through `jax.jit`,
`grad` and shardings, while configuration fields (num_bits, granularity,
dtypes) are static aux data, hashable so they participate in jit cache keys.
Mark static fields with ``static_field()``.
"""

import dataclasses
from typing import Any, Callable, Generic, TypeVar

import jax

from fastforward_tpu import flags
from fastforward_tpu.utils.dataclasses import nocopy_asdict

Params = TypeVar("Params", bound="QuantizationParameters")


def static_field(**kwargs: Any) -> Any:
    """Declare a dataclass field as static pytree aux data (must be hashable)."""
    metadata = dict(kwargs.pop("metadata", ()) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def _register_params_pytree(cls: type) -> None:
    flds = dataclasses.fields(cls)
    data_fields = tuple(f.name for f in flds if not f.metadata.get("static"))
    meta_fields = tuple(f.name for f in flds if f.metadata.get("static"))
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)


class QuantizationParameters:
    """Base class for quantization parameter dataclasses.

    Subclasses must be ``@dataclasses.dataclass``-decorated; they are
    automatically registered as pytrees when first subclass-initialized.
    Parity: reference `function.py:23-48`.
    """

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        # Defer registration until the dataclass decorator ran; do it lazily
        # on first use via _ensure_registered.
        cls._pytree_registered = False

    @classmethod
    def _ensure_registered(cls) -> None:
        if not cls.__dict__.get("_pytree_registered", False):
            _register_params_pytree(cls)
            cls._pytree_registered = True

    def with_changes(self: Params, **changes: Any) -> Params:
        """Return a copy with ``changes`` applied (no deep copy of arrays)."""
        return dataclasses.replace(self, **changes)

    def _apply(self: Params, fn: Callable[[Any], Any]) -> Params:
        """Apply ``fn`` to every array leaf (e.g. device_put, astype)."""
        args = nocopy_asdict(self)
        out = {}
        for key, value in args.items():
            if isinstance(value, jax.Array):
                out[key] = fn(value)
            else:
                out[key] = value
        return type(self)(**out)


def register_parameters(cls: type[Params]) -> type[Params]:
    """Class decorator: make a `QuantizationParameters` dataclass a pytree."""
    _register_params_pytree(cls)
    cls._pytree_registered = True
    return cls


class QuantizationFunction(Generic[Params]):
    """A (quantize, dequantize) pair parameterized by a `Params` dataclass.

    Both are classmethods on a stateless class so the *identity* of the
    function can live in static pytree aux data while the parameters travel
    as pytree children. Parity: reference `function.py:51-77`.
    """

    @classmethod
    def quantize(cls, data: jax.Array, params: Params):
        raise NotImplementedError

    @classmethod
    def dequantize(cls, data: jax.Array, params: Params) -> jax.Array:
        raise NotImplementedError


@dataclasses.dataclass
class QuantizationContext(Generic[Params]):
    """Binds a `QuantizationFunction` to concrete parameters.

    Parity: reference `function.py:78-206`. Registered as a pytree with the
    function class static and the parameters as a child subtree.
    """

    quantization_fn: type[QuantizationFunction] = static_field()
    quantization_params: Params = dataclasses.field()

    def attach(self, data: jax.Array):
        """Wrap ``data`` (already on the integer grid) in a QuantizedArray.

        Under export mode, return the dequantized plain array instead so the
        traced graph stays a dense-dtype StableHLO program
        (reference `function.py:156-166`).
        """
        from fastforward_tpu.quantization.quantized_array import QuantizedArray

        if flags.get_export_mode():
            return self.dequantize(data)
        return QuantizedArray(data, self)

    def quantize(self, data: jax.Array):
        return self.quantization_fn.quantize(data, self.quantization_params)

    def dequantize(self, data: jax.Array) -> jax.Array:
        return self.quantization_fn.dequantize(data, self.quantization_params)

    def with_changes(self, **changes: Any) -> "QuantizationContext[Params]":
        return QuantizationContext(
            self.quantization_fn, self.quantization_params.with_changes(**changes)
        )


jax.tree_util.register_dataclass(
    QuantizationContext,
    data_fields=("quantization_params",),
    meta_fields=("quantization_fn",),
)


def create_quantization_function(
    name: str,
    quantize: Callable[..., jax.Array],
    dequantize: Callable[..., jax.Array],
    static_params: tuple[str, ...] = (),
) -> type[QuantizationFunction]:
    """Build a `QuantizationFunction` subclass + params dataclass from plain
    quantize/dequantize callables by signature inspection.

    Both callables must share a keyword signature ``fn(data, **params)``; the
    parameter names become fields of the generated dataclass; names listed in
    ``static_params`` become static fields.

    Parity: reference `function.py:256-305`.
    """
    import inspect

    sig = inspect.signature(quantize)
    param_names = [p for p in sig.parameters if p != "data"]

    fields = []
    for pname in param_names:
        default = sig.parameters[pname].default
        fld = (
            static_field(default=default)
            if pname in static_params
            else (
                dataclasses.field(default=default)
                if default is not inspect.Parameter.empty
                else dataclasses.field()
            )
        )
        if pname in static_params and default is inspect.Parameter.empty:
            fld = static_field()
        fields.append((pname, Any, fld))

    params_cls = dataclasses.make_dataclass(
        f"{name}Params", fields, bases=(QuantizationParameters,)
    )
    register_parameters(params_cls)

    def _params_kwargs(params):
        return nocopy_asdict(params)

    class GeneratedFunction(QuantizationFunction):
        @classmethod
        def quantize(cls, data, params):
            result = quantize(data, **_params_kwargs(params))
            context = QuantizationContext(cls, params)
            return context.attach(result)

        @classmethod
        def dequantize(cls, data, params):
            return dequantize(data, **_params_kwargs(params))

    GeneratedFunction.__name__ = name
    GeneratedFunction.Params = params_cls  # type: ignore[attr-defined]
    return GeneratedFunction
