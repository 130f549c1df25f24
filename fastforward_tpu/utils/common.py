"""Small shared helpers.

Parity: reference `src/fastforward/common.py:13-60`, `_import.py:12-31` and
`type_common.py:25-75` (MethodType/method_type).
"""

import enum
import importlib
import types
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


class MethodType(enum.Enum):
    """How a name is bound on a class/module (reference `type_common.py:25`)."""

    METHOD = enum.auto()
    CLASS_METHOD = enum.auto()
    STATIC_METHOD = enum.auto()
    NO_METHOD = enum.auto()


def method_type(cls_or_module: Any, method_name: str) -> MethodType:
    """Classify ``method_name`` on a class or module.

    Module-level functions report STATIC_METHOD (no implicit first argument);
    a missing name or a non-callable attribute reports NO_METHOD.
    """
    if not isinstance(cls_or_module, (type, types.ModuleType)):
        raise ValueError("'cls_or_module' must be a module or class")
    attr = cls_or_module.__dict__.get(method_name)
    if isinstance(cls_or_module, type):
        if isinstance(attr, classmethod):
            return MethodType.CLASS_METHOD
        if isinstance(attr, staticmethod):
            return MethodType.STATIC_METHOD
        if isinstance(attr, types.FunctionType):
            return MethodType.METHOD
        return MethodType.NO_METHOD
    if isinstance(attr, types.FunctionType):
        return MethodType.STATIC_METHOD
    return MethodType.NO_METHOD


class classproperty:
    """Read-only property on the class (reference `_utils/classproperty.py`)."""

    def __init__(self, fget: Callable[[type], Any]):
        self.fget = fget

    def __get__(self, obj: Any, owner: Optional[type] = None) -> Any:
        return self.fget(owner if owner is not None else type(obj))
