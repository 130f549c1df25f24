"""Top-level namespace parity with the reference `fastforward` package.

Reference `src/fastforward/__init__.py` exports; every name a reference user
would reach for must resolve on `fastforward_tpu` (lazily or directly).
"""

import fastforward_tpu as ff


REFERENCE_NAMES = [
    # classes / functions re-exported at top level by the reference
    "QuantizationConfig", "QuantizedTensor", "QuantizedArray",
    "annotate_operator_metadata", "autoquantize", "disable_quantization",
    "enable_quantization", "estimate_ranges", "find_quantizers",
    "quantize_model", "quantized_module_map", "surrogate_quantized_modules",
    "sdpa_upcast", "strict_quantization", "strict_quantization_for_module",
    "export_mode", "version",
    # submodule aliases
    "affine", "granularity", "random", "range_setting", "mpath", "nn",
    "testing", "logging_utils", "dataclasses", "type_common",
]


def test_reference_namespace_resolves():
    # GIVEN the reference's top-level names # WHEN resolved on fastforward_tpu
    # THEN every one exists (lazy __getattr__ included)
    missing = [n for n in REFERENCE_NAMES if not hasattr(ff, n)]
    assert not missing, f"missing reference-parity names: {missing}"


def test_quantized_tensor_alias_is_quantized_array():
    assert ff.QuantizedTensor is ff.QuantizedArray


def test_surrogate_quantized_modules_builds_conversion_dict():
    # GIVEN a model with an unquantizable container type
    from flax import nnx

    class Holder(nnx.Module):
        def __init__(self, rngs):
            self.inner = nnx.Linear(4, 4, rngs=rngs)

        def __call__(self, x):
            return self.inner(x)

    m = Holder(nnx.Rngs(0))
    conv = ff.surrogate_quantized_modules(m)
    # THEN the holder type gets a pass-through QuantizedModule counterpart
    assert Holder in conv
    assert issubclass(conv[Holder], Holder)
