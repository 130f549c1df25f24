"""Per-module strict-quantization scoping.

Parity: reference `src/fastforward/quantization/strict_quantization.py:17-100`
— toggle the global strict flag for the duration of one module's forward,
regardless of the surrounding context.

In eager torch this is a pre/post-forward-hook pair; here the module's
``__call__`` is wrapped so the flag flips around the call (same effect, and
the flag is a ContextVar so the scoping is exact even across nested calls).
"""

import functools
from typing import Any

from fastforward_tpu import flags


class ModuleStrictQuantHandle:
    """Handle for a per-module strict-quantization override."""

    def __init__(self, module: Any, value: bool):
        self._module = module
        self._value = value
        self._original_cls = type(module)

        original_call = self._original_cls.__call__
        value_ = value

        @functools.wraps(original_call)
        def call_with_strict(mod, *args: Any, **kwargs: Any):
            with flags.strict_quantization(value_):
                return original_call(mod, *args, **kwargs)

        scoped_cls = type(
            f"_StrictScoped{self._original_cls.__name__}",
            (self._original_cls,),
            {"__call__": call_with_strict},
        )
        module.__class__ = scoped_cls

    def remove(self) -> None:
        self._module.__class__ = self._original_cls

    def __enter__(self) -> "ModuleStrictQuantHandle":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.remove()


def strict_quantization_for_module(module: Any, value: bool = True) -> ModuleStrictQuantHandle:
    """Force strict quantization on/off for ``module``'s forwards.

    Usable as a context manager:

        with strict_quantization_for_module(model.decoder, False):
            model(x)
    """
    return ModuleStrictQuantHandle(module, value)
