"""Global context flags.

TPU-native re-design of the reference flag system
(`src/fastforward/flags.py:28-106`): each flag has a getter, setter, and
context-manager triple. Unlike the reference (plain module globals mutated in
eager mode), these are backed by `contextvars.ContextVar` so they compose with
nested contexts and are read at *trace time* — the flag value in effect while
`jax.jit` traces a function is baked into the jaxpr, which makes strict
quantization a trace-time (compile-time) check rather than a per-call runtime
cost.
"""

import contextlib
import functools
from contextvars import ContextVar
from typing import Any, Callable, Iterator, TypeVar

_T = TypeVar("_T")

_FLAGS: dict[str, ContextVar[bool]] = {}


def _context_flag(
    name: str, default: bool
) -> tuple[Callable[[], bool], Callable[[bool], None], Callable[[bool], Any]]:
    """Create a (getter, setter, context-manager) triple for a boolean flag.

    Parity: reference `flags.py:28-58`.
    """
    var: ContextVar[bool] = ContextVar(name, default=default)
    _FLAGS[name] = var

    def getter() -> bool:
        return var.get()

    def setter(value: bool) -> None:
        var.set(bool(value))

    @contextlib.contextmanager
    def manager(value: bool = True) -> Iterator[None]:
        token = var.set(bool(value))
        try:
            yield
        finally:
            var.reset(token)

    getter.__name__ = f"get_{name}"
    setter.__name__ = f"set_{name}"
    manager.__name__ = name  # type: ignore[attr-defined]
    return getter, setter, manager


def context(flag_manager: Callable[[bool], Any], value: bool = True) -> Callable[..., Any]:
    """Decorator running the wrapped function under ``flag_manager(value)``.

    Parity: reference `flags.py:61-81`.
    """

    def decorator(func: Callable[..., _T]) -> Callable[..., _T]:
        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> _T:
            with flag_manager(value):
                return func(*args, **kwargs)

        return wrapper

    return decorator


# Strict quantization (default True): operators raise `QuantizationError` when
# an input declared Quantized is not a QuantizedArray or when no output
# quantizer is provided. Reference `flags.py:84`.
get_strict_quantization, set_strict_quantization, strict_quantization = _context_flag(
    "strict_quantization", default=True
)

# Export mode (default False): quantizers emit quantize->dequantize'd *plain*
# arrays instead of QuantizedArray so the whole model stages out as a single
# dense-dtype StableHLO graph. Reference `flags.py:90`.
get_export_mode, set_export_mode, export_mode = _context_flag("export_mode", default=False)

# Kernel execution tier (default True): when True, quantized operators may
# dispatch to Pallas low-bit kernels; when False, everything runs through the
# simulation tier (pure-jnp fake quantization). The reference's analogous
# switch is `compiled_quant_funcs` (`flags.py:96`) which toggles torch.compile.
get_use_kernels, set_use_kernels, use_kernels = _context_flag("use_kernels", default=True)
