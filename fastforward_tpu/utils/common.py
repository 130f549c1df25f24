"""Small shared helpers.

Parity: reference `src/fastforward/common.py:13-60` and `_import.py:12-31`.
"""

import importlib
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def ensure_array(value: Any, dtype: Any = None) -> jax.Array:
    """Coerce scalars/sequences to a jnp array (reference `ensure_tensor`)."""
    return jnp.asarray(value, dtype=dtype)


def array_or_none(value: Any, dtype: Any = None) -> Optional[jax.Array]:
    """None-propagating coercion (reference `tensor_or_none`)."""
    return None if value is None else jnp.asarray(value, dtype=dtype)


def maybe_array_apply(fn: Callable[[jax.Array], jax.Array], value: Any) -> Any:
    """Apply ``fn`` if the value is an array, pass through otherwise
    (reference `maybe_tensor_apply`)."""
    if isinstance(value, jax.Array):
        return fn(value)
    return value


def fully_qualified_name(obj: Any) -> str:
    """module.QualName of a class or callable (reference `_import.py:12`)."""
    t = obj if isinstance(obj, type) else type(obj)
    if callable(obj) and hasattr(obj, "__qualname__"):
        t = obj
    return f"{t.__module__}.{t.__qualname__}"


def import_by_name(name: str) -> Any:
    """Resolve a qualified name lazily (reference `QualifiedNameReference`)."""
    mod_name, _, attr = name.rpartition(".")
    return getattr(importlib.import_module(mod_name), attr)


class classproperty:
    """Read-only property on the class (reference `_utils/classproperty.py`)."""

    def __init__(self, fget: Callable[[type], Any]):
        self.fget = fget

    def __get__(self, obj: Any, owner: Optional[type] = None) -> Any:
        return self.fget(owner if owner is not None else type(obj))
