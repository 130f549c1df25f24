"""Dispatcher tests. Modeled on reference `tests/test_dispatcher.py`."""

import pytest

from fastforward_tpu import dispatcher
from fastforward_tpu.dispatcher import DispatcherPriority, Predicate, predicate


@pytest.fixture(autouse=True)
def _clean_registry():
    saved = dict(dispatcher._DISPATCHER)
    dispatcher._DISPATCHER.clear()
    yield
    dispatcher._DISPATCHER.clear()
    dispatcher._DISPATCHER.update(saved)


def test_register_and_dispatch():
    dispatcher.register("op", lambda x: x + 1)
    kernel = dispatcher.dispatch("op", 1)
    assert kernel is not None and kernel(1) == 2


def test_dispatch_returns_none_when_no_match():
    assert dispatcher.dispatch("missing") is None


def test_predicate_selects_kernel():
    is_positive = Predicate(lambda x: x > 0)
    dispatcher.register("op", lambda x: "pos", predicate=is_positive)
    dispatcher.register("op", lambda x: "neg", predicate=~is_positive)
    assert dispatcher.dispatch("op", 3)(3) == "pos"
    assert dispatcher.dispatch("op", -3)(-3) == "neg"


def test_predicate_composition():
    p = Predicate(lambda x: x > 0)
    q = Predicate(lambda x: x % 2 == 0)
    assert (p & q)(4)
    assert not (p & q)(3)
    assert (p | q)(-2)
    assert not (p | q)(-3)
    assert (~p)(-1)


def test_priority_ordering():
    dispatcher.register(
        "op", lambda x: "fallback", priority=DispatcherPriority.FALLBACK
    )
    dispatcher.register("op", lambda x: "default", priority=DispatcherPriority.DEFAULT)
    # DEFAULT beats FALLBACK regardless of registration order
    assert dispatcher.dispatch("op", 0)(0) == "default"


def test_newest_wins_within_priority():
    dispatcher.register("op", lambda x: "first")
    dispatcher.register("op", lambda x: "second")
    assert dispatcher.dispatch("op", 0)(0) == "second"


def test_context_manager_registration():
    with dispatcher.dispatcher_context("op", lambda x: "temp"):
        assert dispatcher.dispatch("op", 0)(0) == "temp"
    assert dispatcher.dispatch("op", 0) is None


def test_handle_removal():
    handle = dispatcher.register("op", lambda x: "a")
    handle.remove()
    assert dispatcher.dispatch("op", 0) is None


def test_decorator_registration():
    @dispatcher.register("op")
    def kernel(x):
        return x * 2

    assert dispatcher.dispatch("op", 0)(2) == 4


def test_predicate_signature_mismatch_is_no_match():
    dispatcher.register("op", lambda x, y: x, predicate=Predicate(lambda x, y: True))
    # Called with the wrong arity -> predicate doesn't match instead of raising
    assert dispatcher.dispatch("op", 1) is None


def test_predicate_decorator():
    @predicate
    def always(*args, **kwargs):
        return True

    assert isinstance(always, Predicate)
    assert always(1, 2, k=3)
