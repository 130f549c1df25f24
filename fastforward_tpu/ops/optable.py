"""Operator table: the single source of truth for quantized operators.

Parity: reference `src/fastforward/_quantops/` (YAML spec + OperatorTable,
`optable.py:53-130`) and the generated dispatch/fallback wrappers in
`src/fastforward/_gen/{operators,fallback}.py`.

TPU-native design: instead of source-to-source codegen, each operator is a
plain function whose *body is the dense fallback implementation*; the
`@quantized_op` decorator wraps it with (1) dispatcher lookup, (2) strict-
quantization guards, (3) the dequantize fallback, and (4) the
``output_quantizer`` re-quantization slot. Because ops run under `jax.jit`,
all of this resolves at trace time — the compiled program contains only the
selected kernel.

The table is introspectable (`OPERATOR_TABLE`) and is what trace-time op
substitution (the autoquant analog) consults to decide which calls are
replaceable.
"""

import dataclasses
import functools
import inspect
from contextvars import ContextVar
from typing import Any, Callable, Optional, Sequence

from fastforward_tpu import dispatcher, flags
from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.quantization.quantized_array import QuantizedArray

__all__ = ["OperatorSpec", "OPERATOR_TABLE", "quantized_op", "get_operator", "resolve_operator"]


@dataclasses.dataclass(frozen=True)
class OperatorSpec:
    """Metadata for one quantized operator.

    - ``quantized``: parameter names that must be QuantizedArray under strict
      quantization.
    - ``maybe_quantized``: parameters that may be quantized (dequantized if so,
      never required).
    - ``dense_fn``: the dense (simulation-tier) implementation.
    - ``aliases``: alternative qualified names resolving to this op (parity
      with the reference YAML ``aliases`` field).
    """

    name: str
    quantized: tuple[str, ...]
    maybe_quantized: tuple[str, ...]
    dense_fn: Callable[..., Any]
    wrapper: Callable[..., Any]
    aliases: tuple[str, ...] = ()
    num_outputs: int = 1


OPERATOR_TABLE: dict[str, OperatorSpec] = {}
_ALIASES: dict[str, str] = {}

# True while executing inside a quantized-op body — lets the autoquant
# substitution layer ignore the jnp/jax.nn calls our own fallbacks make.
IN_QUANTIZED_OP: ContextVar[bool] = ContextVar("in_quantized_op", default=False)

# Observers notified with the op name whenever a quantized operator runs
# (used by quantizer annotation; reference `quantizer_annotations.py`).
OP_OBSERVERS: list[Callable[[str], None]] = []


def get_operator(name: str) -> Optional[OperatorSpec]:
    if name in OPERATOR_TABLE:
        return OPERATOR_TABLE[name]
    if name in _ALIASES:
        return OPERATOR_TABLE[_ALIASES[name]]
    return None


def resolve_operator(fn: Callable[..., Any]) -> Optional[OperatorSpec]:
    """Find the operator spec whose dense function is ``fn`` (used by the
    trace-time substitution machinery; parity with OperatorTable keying on
    fallback callables, reference `optable.py:53-80`).
    """
    for spec in OPERATOR_TABLE.values():
        if spec.dense_fn is fn or spec.wrapper is fn:
            return spec
    return None


def _is_stub(quantizer: Any) -> bool:
    return quantizer is None or getattr(quantizer, "is_stub", False)


def _check_strict(
    name: str,
    bound: inspect.BoundArguments,
    quantized: Sequence[str],
    output_quantizer: Any,
) -> None:
    """Strict-quantization guards.

    Parity: reference `_gen/fallback.py:81-97` — raise QuantizationError when
    the op would silently produce/consume unquantized data.
    """
    if _is_stub(output_quantizer):
        raise QuantizationError(
            f"'{name}' requires an output quantizer under strict quantization. "
            "Pass output_quantizer=..., or disable strict quantization "
            "(fastforward_tpu.strict_quantization(False))."
        )
    for pname in quantized:
        if pname not in bound.arguments:
            continue
        value = bound.arguments[pname]
        if value is None:
            continue
        if isinstance(value, (list, tuple)):
            ok = all(isinstance(v, QuantizedArray) for v in value)
        else:
            ok = isinstance(value, QuantizedArray)
        if not ok:
            raise QuantizationError(
                f"Argument '{pname}' of '{name}' must be quantized under strict "
                "quantization, but received an unquantized value. Quantize the "
                "input or disable strict quantization."
            )


def _dequantize_tree(value: Any) -> Any:
    if isinstance(value, QuantizedArray):
        return value.dequantize()
    if isinstance(value, (list, tuple)):
        return type(value)(_dequantize_tree(v) for v in value)
    return value


def quantized_op(
    name: Optional[str] = None,
    *,
    quantized: Sequence[str] = (),
    maybe_quantized: Sequence[str] = (),
    aliases: Sequence[str] = (),
    num_outputs: int = 1,
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Declare a quantized operator.

    The decorated function body is the dense fallback. The returned wrapper
    adds, in order (reference `_gen/operators.py:74-103` +
    `_gen/fallback.py:72-106` semantics):

    1. dispatcher lookup — the first registered kernel whose predicate
       matches the (possibly quantized) arguments runs instead;
    2. strict-quantization checks;
    3. dequantize-and-run-dense fallback;
    4. re-quantization through ``output_quantizer``.
    """

    def decorator(fn: Callable[..., Any]) -> Callable[..., Any]:
        op_name = name or fn.__name__
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(
            *args: Any,
            output_quantizer: Any = None,
            strict_quantization: Optional[bool] = None,
            **kwargs: Any,
        ) -> Any:
            for observer in OP_OBSERVERS:
                observer(op_name)
            token = IN_QUANTIZED_OP.set(True)
            try:
                return _invoke(args, output_quantizer, strict_quantization, kwargs)
            finally:
                IN_QUANTIZED_OP.reset(token)

        def _invoke(args, output_quantizer, strict_quantization, kwargs):
            strict = (
                flags.get_strict_quantization()
                if strict_quantization is None
                else strict_quantization
            )

            # 1. Dispatcher: a registered kernel (e.g. a fused Pallas
            # dequant-matmul) takes over the whole op, including output
            # quantization.
            kernel = dispatcher.dispatch(op_name, *args, **kwargs)
            if kernel is not None:
                return kernel(*args, output_quantizer=output_quantizer, **kwargs)

            bound = sig.bind(*args, **kwargs)

            # 2. Strict guards.
            if strict:
                _check_strict(op_name, bound, quantized, output_quantizer)

            # 3. Dense fallback on dequantized inputs.
            dense_args = {k: _dequantize_tree(v) for k, v in bound.arguments.items()}
            bound.arguments.update(dense_args)
            result = fn(*bound.args, **bound.kwargs)

            # 4. Output re-quantization.
            if not _is_stub(output_quantizer):
                return output_quantizer(result)
            return result

        wrapper.__signature__ = _extend_signature(sig)  # type: ignore[attr-defined]
        spec = OperatorSpec(
            name=op_name,
            quantized=tuple(quantized),
            maybe_quantized=tuple(maybe_quantized),
            dense_fn=fn,
            wrapper=wrapper,
            aliases=tuple(aliases),
            num_outputs=num_outputs,
        )
        OPERATOR_TABLE[op_name] = spec
        for alias in aliases:
            _ALIASES[alias] = op_name
        wrapper.spec = spec  # type: ignore[attr-defined]
        return wrapper

    return decorator


def _extend_signature(sig: inspect.Signature) -> inspect.Signature:
    params = list(sig.parameters.values())
    params.append(
        inspect.Parameter("output_quantizer", inspect.Parameter.KEYWORD_ONLY, default=None)
    )
    params.append(
        inspect.Parameter("strict_quantization", inspect.Parameter.KEYWORD_ONLY, default=None)
    )
    return sig.replace(parameters=params)
