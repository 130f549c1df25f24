"""YAML-serializable objects.

Parity: reference `src/fastforward/serialization.py:20-230` — the
``@yamlable`` decorator wraps ``__init__`` to record constructor arguments so
instances round-trip through YAML with the ``!ff.obj`` tag. Used for
granularities and quantizer configs in saved quantization state.
"""

import functools
import inspect
from typing import Any

import yaml

_YAML_TAG = "!ff.obj"
_REGISTRY: dict[str, type] = {}


def yamlable(cls: type) -> type:
    """Class decorator: record init args, register for YAML round-tripping.

    Idempotent — re-decorating a class (or decorating a subclass whose
    ``__init__`` is already wrapped) is a no-op for that ``__init__``.
    """
    if cls.__dict__.get("_ff_yamlable"):
        return cls
    cls._ff_yamlable = True
    original_init = cls.__init__
    sig = inspect.signature(original_init)

    @functools.wraps(original_init)
    def wrapped_init(self, *args: Any, **kwargs: Any) -> None:
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        recorded = dict(bound.arguments)
        recorded.pop("self", None)
        recorded.pop("args", None)
        recorded.pop("kwargs", None)
        object.__setattr__(self, "_yaml_init_args", recorded)
        original_init(self, *args, **kwargs)

    cls.__init__ = wrapped_init
    _REGISTRY[f"{cls.__module__}.{cls.__qualname__}"] = cls
    return cls


def _qualified_name(obj: Any) -> str:
    t = type(obj)
    return f"{t.__module__}.{t.__qualname__}"


def to_yamlable_dict(obj: Any) -> dict[str, Any]:
    if not hasattr(obj, "_yaml_init_args"):
        raise TypeError(f"{type(obj).__name__} is not @yamlable")
    args = {k: _encode(v) for k, v in obj._yaml_init_args.items()}
    return {"type": _qualified_name(obj), "args": args}


def _encode(value: Any) -> Any:
    if hasattr(value, "_yaml_init_args"):
        return to_yamlable_dict(value)
    if isinstance(value, tuple):
        return list(value)
    return value


def from_yamlable_dict(data: dict[str, Any]) -> Any:
    name = data["type"]
    cls = _REGISTRY.get(name)
    if cls is None:
        # Import-by-name fallback (reference `_import.py:12-31`).
        import importlib

        mod_name, _, cls_name = name.rpartition(".")
        cls = getattr(importlib.import_module(mod_name), cls_name)
    args = {k: _decode(v) for k, v in data.get("args", {}).items()}
    return cls(**args)


def _decode(value: Any) -> Any:
    if isinstance(value, dict) and "type" in value and "args" in value:
        return from_yamlable_dict(value)
    if isinstance(value, list):
        return tuple(value)
    return value


def _represent(dumper: yaml.Dumper, obj: Any) -> yaml.Node:
    return dumper.represent_mapping(_YAML_TAG, to_yamlable_dict(obj))


def _construct(loader: yaml.Loader, node: yaml.Node) -> Any:
    return from_yamlable_dict(loader.construct_mapping(node, deep=True))


class FFDumper(yaml.SafeDumper):
    pass


class FFLoader(yaml.SafeLoader):
    pass


FFLoader.add_constructor(_YAML_TAG, _construct)


def register_yaml_representers() -> None:
    for cls in _REGISTRY.values():
        FFDumper.add_representer(cls, _represent)


def dump(data: Any) -> str:
    register_yaml_representers()
    return yaml.dump(data, Dumper=FFDumper, sort_keys=True)


def load(text: str) -> Any:
    return yaml.load(text, Loader=FFLoader)


# Granularity classes decorate themselves at definition time
# (quantization/granularity.py) so instances constructed before this module
# is imported still round-trip. Nothing to register here.
