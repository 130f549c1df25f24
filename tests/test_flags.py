"""Flag tests. Modeled on reference `tests/test_flags.py`."""

from fastforward_tpu import flags


def test_defaults():
    assert flags.get_strict_quantization() is True
    assert flags.get_export_mode() is False
    assert flags.get_use_kernels() is True


def test_context_manager_restores():
    assert flags.get_strict_quantization() is True
    with flags.strict_quantization(False):
        assert flags.get_strict_quantization() is False
        with flags.strict_quantization(True):
            assert flags.get_strict_quantization() is True
        assert flags.get_strict_quantization() is False
    assert flags.get_strict_quantization() is True


def test_setter():
    flags.set_export_mode(True)
    try:
        assert flags.get_export_mode() is True
    finally:
        flags.set_export_mode(False)


def test_context_decorator():
    @flags.context(flags.export_mode, True)
    def inner():
        return flags.get_export_mode()

    assert inner() is True
    assert flags.get_export_mode() is False
