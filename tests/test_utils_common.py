"""Tests for utils.common (MethodType) and testing.package_mock.

Parity: reference `type_common.py:25-75`, `testing/package_mock.py:24-140`.
"""

import inspect

import pytest

from fastforward_tpu.testing import PackageMock
from fastforward_tpu.utils.common import MethodType, method_type


class _Sample:
    def regular(self):
        pass

    @classmethod
    def cls_method(cls):
        pass

    @staticmethod
    def static_method():
        pass

    attr = 3


def test_method_type_classification():
    # GIVEN a class with every flavor of method
    # THEN each is classified correctly
    assert method_type(_Sample, "regular") is MethodType.METHOD
    assert method_type(_Sample, "cls_method") is MethodType.CLASS_METHOD
    assert method_type(_Sample, "static_method") is MethodType.STATIC_METHOD
    assert method_type(_Sample, "missing") is MethodType.NO_METHOD
    assert method_type(_Sample, "attr") is MethodType.NO_METHOD


def test_method_type_on_module():
    # GIVEN a module: top-level functions have no implicit first arg
    import fastforward_tpu.utils.common as mod

    assert method_type(mod, "method_type") is MethodType.STATIC_METHOD
    assert method_type(mod, "nope") is MethodType.NO_METHOD


def test_method_type_rejects_instances():
    with pytest.raises(ValueError):
        method_type(_Sample(), "regular")


def test_package_mock_import_and_cleanup():
    import sys

    # GIVEN two fake modules, one importing the other
    pkg = PackageMock({"ff_fake_pkg.a": "def foo():\n    return 1\n"})
    pkg.add_module("ff_fake_pkg.b", "from ff_fake_pkg import a\nbar = a.foo() + 1\n")
    # WHEN the context is active
    with pkg:
        import ff_fake_pkg.b as b

        assert b.bar == 2
        # inspect.getsource works through linecache
        import ff_fake_pkg.a as a

        assert "def foo" in inspect.getsource(a)
    # THEN everything is purged on exit
    assert "ff_fake_pkg" not in sys.modules
    assert "ff_fake_pkg.a" not in sys.modules
    with pytest.raises(ImportError):
        import ff_fake_pkg.c  # noqa: F401


def test_package_mock_sealed_and_validated():
    pkg = PackageMock()
    with pytest.raises(ValueError):
        pkg.add_module("not-valid-name")
    pkg.add_module("ff_fake_solo", "x = 5")
    with pkg:
        with pytest.raises(RuntimeError):
            pkg.add_module("ff_fake_other")
        import ff_fake_solo

        assert ff_fake_solo.x == 5
    # re-enterable after exit
    with pkg:
        import ff_fake_solo

        assert ff_fake_solo.x == 5
