"""Stackable function-override machinery.

Parity: reference `src/fastforward/forward_override.py:16-130` — a generic
mechanism for wrapping a module's forward/quantize function with a stack of
overrides. Each override receives a context, the function it overrides (the
next override down the stack, or the original function), and the call
arguments. Used by range estimators, quantization disabling and freezing.
"""

import weakref
from typing import Any, Callable, Optional, Protocol


class OverrideFn(Protocol):
    def __call__(
        self,
        context: Any,
        overridden_fn: Callable[..., Any],
        args: tuple[Any, ...],
        kwargs: dict[str, Any],
    ) -> Any: ...


class OverrideHandle:
    """Handle to a registered override; removing it detaches the override.

    Also usable as a context manager. Parity: reference
    `forward_override.py:44-93`.
    """

    def __init__(self, owner: Any, override: OverrideFn):
        self._owner = weakref.ref(owner)
        self.override = override
        self.enabled = True

    def remove(self) -> None:
        owner = self._owner()
        if owner is not None:
            owner._remove_override_handle(self)
        self.enabled = False

    def __enter__(self) -> "OverrideHandle":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.remove()


class OverrideMixin:
    """Mixin providing an override stack for a callable module.

    The wrapped function is produced by `apply_overrides`; overrides apply
    top-of-stack first (most recently registered runs outermost).
    """

    __slots__ = ()

    def _override_handles(self) -> list[OverrideHandle]:
        if not hasattr(self, "_overrides"):
            object.__setattr__(self, "_overrides", [])
        return self._overrides  # type: ignore[attr-defined]

    def register_override(self, override: OverrideFn) -> OverrideHandle:
        handle = OverrideHandle(self, override)
        self._override_handles().append(handle)
        return handle

    def _remove_override_handle(self, handle: OverrideHandle) -> None:
        handles = self._override_handles()
        if handle in handles:
            handles.remove(handle)

    @property
    def has_overrides(self) -> bool:
        return bool(self._override_handles())


def apply_overrides(
    context: Any,
    base_fn: Callable[..., Any],
    handles: Optional[list[OverrideHandle]] = None,
) -> Callable[..., Any]:
    """Build the wrapped callable: overrides chain outermost-last-registered.

    Parity: reference `forward_override.py:96-120`.
    """
    if handles is None:
        handles = getattr(context, "_overrides", [])

    fn = base_fn
    for handle in handles:
        if not handle.enabled:
            continue
        fn = _bind(handle.override, context, fn)
    return fn


def _bind(override: OverrideFn, context: Any, inner: Callable[..., Any]) -> Callable[..., Any]:
    def wrapped(*args: Any, **kwargs: Any) -> Any:
        return override(context, inner, args, kwargs)

    return wrapped
