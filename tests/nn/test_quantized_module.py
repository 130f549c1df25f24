"""Model conversion tests.

Modeled on reference `tests/nn/test_quantized_module.py` (class-swap
conversion, module map, named_quantizers) and `tests/nn/test_linear_quantizer.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn


class MLP(nnx.Module):
    def __init__(self, din, dhidden, dout, *, rngs):
        self.fc1 = nnx.Linear(din, dhidden, rngs=rngs)
        self.fc2 = nnx.Linear(dhidden, dout, rngs=rngs)

    def __call__(self, x):
        return self.fc2(jax.nn.relu(self.fc1(x)))


@pytest.fixture
def mlp():
    return MLP(4, 8, 2, rngs=nnx.Rngs(0))


def test_quantize_model_swaps_classes(mlp):
    # GIVEN a plain nnx model WHEN converting
    ffnn.quantize_model(mlp)
    # THEN linears became QuantizedLinear with stub quantizers
    assert isinstance(mlp.fc1, ffnn.QuantizedLinear)
    assert isinstance(mlp.fc2, ffnn.QuantizedLinear)
    assert isinstance(mlp.fc1.weight_quantizer, ffnn.QuantizerStub)
    # AND the root got a pass-through surrogate
    assert isinstance(mlp, ffnn.QuantizedModule)


def test_converted_model_preserves_params(mlp):
    w_before = np.asarray(mlp.fc1.kernel.value)
    ffnn.quantize_model(mlp)
    np.testing.assert_array_equal(np.asarray(mlp.fc1.kernel.value), w_before)


def test_converted_model_runs_nonstrict(mlp):
    x = jnp.ones((2, 4))
    expected = np.asarray(mlp(x))
    ffnn.quantize_model(mlp)
    with ff.strict_quantization(False):
        out = mlp(x)
    # Stub quantizers pass through — identical output
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_converted_model_strict_raises_with_stubs(mlp):
    ffnn.quantize_model(mlp)
    with pytest.raises(ff.QuantizationError):
        mlp(jnp.ones((2, 4)))


def test_named_quantizers(mlp):
    ffnn.quantize_model(mlp)
    names = {name for name, _ in ffnn.named_quantizers(mlp)}
    assert "fc1/weight_quantizer" in names
    assert "fc2/output_quantizer" in names
    assert len(names) == 8


def _initialize_all_quantizers(model, num_bits=8, range_=(-4.0, 4.0)):
    for _, module in nnx.iter_modules(model):
        if isinstance(module, ffnn.QuantizedModule):
            for name, q in list(module.named_quantizers()):
                lq = ffnn.LinearQuantizer(num_bits=num_bits, symmetric=False)
                lq.quantization_range = range_
                setattr(module, name, lq)


class OpsMLP(nnx.Module):
    """A quantization-aware MLP: the nonlinearity uses fastforward ops so the
    fully-strict path has an interceptable op between the two linears."""

    def __init__(self, din, dhidden, dout, *, rngs):
        from fastforward_tpu import ops

        self.fc1 = nnx.Linear(din, dhidden, rngs=rngs)
        self.fc2 = nnx.Linear(dhidden, dout, rngs=rngs)
        self.relu_quantizer = ffnn.QuantizerStub("activation/relu")
        self._relu = ops.relu

    def __call__(self, x):
        h = self.fc1(x)
        h = self._relu(h, output_quantizer=self.relu_quantizer)
        return self.fc2(h)


def test_initialized_quantizers_run_strict():
    model = OpsMLP(4, 8, 2, rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    _initialize_all_quantizers(model)
    model.relu_quantizer = ffnn.LinearQuantizer(num_bits=8, symmetric=False)
    model.relu_quantizer.quantization_range = (0.0, 4.0)
    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    out = model(x)  # fully strict — every op quantized
    assert isinstance(out, ff.QuantizedArray)


def test_strict_errors_on_implicit_dequantize(mlp):
    # A plain-jnp nonlinearity between quantized linears raises under strict
    ffnn.quantize_model(mlp)
    _initialize_all_quantizers(mlp)
    with pytest.raises(ff.QuantizationError, match="implicitly dequantize"):
        mlp(jnp.ones((2, 4)))


def test_nonstrict_implicit_dequantize_works(mlp):
    ffnn.quantize_model(mlp)
    _initialize_all_quantizers(mlp)
    with ff.strict_quantization(False):
        out = mlp(jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32))
    assert out.shape == (2, 2)


def test_quantize_model_skip(mlp):
    ffnn.quantize_model(mlp, extra_conversion={nnx.Linear: ffnn.SKIP_QUANTIZATION})
    assert not isinstance(mlp.fc1, ffnn.QuantizedLinear)


def test_check_quantizable_reports_missing():
    class Custom(nnx.Module):
        def __init__(self, *, rngs):
            self.w = nnx.Param(jnp.ones((3, 3)))

        def __call__(self, x):
            return x @ self.w.value

    class Model(nnx.Module):
        def __init__(self, *, rngs):
            self.custom = Custom(rngs=rngs)

    model = Model(rngs=nnx.Rngs(0))
    with pytest.raises(ff.QuantizationError, match="Custom"):
        ffnn.quantize_model(model)


def test_extra_conversion_for_custom_type():
    class Custom(nnx.Module):
        def __init__(self, *, rngs):
            self.w = nnx.Param(jnp.ones((3, 3)))

        def __call__(self, x):
            return x @ self.w.value

    class QuantizedCustom(ffnn.QuantizedModule, Custom):
        def __init_quantization__(self):
            super().__init_quantization__()
            self.weight_quantizer = ffnn.QuantizerStub(weight_quantizer=True)

    class Model(nnx.Module):
        def __init__(self, *, rngs):
            self.custom = Custom(rngs=rngs)

    model = Model(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)  # QuantizedCustom auto-registered via subclass
    assert isinstance(model.custom, QuantizedCustom)


def test_summarize_quantizers(mlp):
    ffnn.quantize_model(mlp)
    summary = ffnn.summarize_quantizers(mlp)
    assert "stub" in summary
    assert "fc1/weight_quantizer" in summary


def test_quantized_embed_and_norms():
    class Tiny(nnx.Module):
        def __init__(self, *, rngs):
            self.emb = nnx.Embed(10, 8, rngs=rngs)
            self.ln = nnx.LayerNorm(8, rngs=rngs)
            self.rms = nnx.RMSNorm(8, rngs=rngs)

        def __call__(self, ids):
            return self.rms(self.ln(self.emb(ids)))

    model = Tiny(rngs=nnx.Rngs(0))
    ids = jnp.array([1, 2, 3])
    expected = np.asarray(model(ids))
    ffnn.quantize_model(model)
    assert isinstance(model.emb, ffnn.QuantizedEmbed)
    assert isinstance(model.ln, ffnn.QuantizedLayerNorm)
    assert isinstance(model.rms, ffnn.QuantizedRMSNorm)
    with ff.strict_quantization(False):
        out = model(ids)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_quantized_conv():
    conv = nnx.Conv(3, 8, kernel_size=(3, 3), rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.randn(1, 8, 8, 3), dtype=jnp.float32)
    expected = np.asarray(conv(x))
    ffnn.quantize_model(conv)
    assert isinstance(conv, ffnn.QuantizedConv)
    with ff.strict_quantization(False):
        out = conv(x)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_nnx_split_works_after_conversion(mlp):
    ffnn.quantize_model(mlp)
    graphdef, state = nnx.split(mlp)
    rebuilt = nnx.merge(graphdef, state)
    assert isinstance(rebuilt.fc1, ffnn.QuantizedLinear)


def test_quantized_sequential_container():
    # Containers convert transparently and recurse into children
    # (reference nn/container.py: QuantizedSequential).
    model = nnx.Sequential(
        nnx.Linear(4, 8, rngs=nnx.Rngs(0)),
        nnx.Linear(8, 2, rngs=nnx.Rngs(1)),
    )
    x = jnp.asarray(np.random.randn(3, 4), dtype=jnp.float32)
    expected = np.asarray(model(x))
    ffnn.quantize_model(model)
    assert isinstance(model, ffnn.QuantizedSequential)
    assert all(isinstance(l, ffnn.QuantizedLinear) for l in model.layers)
    with ff.strict_quantization(False):
        out = model(x)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_string_helpers_and_classproperty():
    from fastforward_tpu.testing import assert_strings_match_verbose, dedent_strip
    from fastforward_tpu.utils.common import classproperty

    assert dedent_strip("""
        a
          b
    """) == "a\n  b"
    with pytest.raises(AssertionError, match="strings do not match"):
        assert_strings_match_verbose("a\nb", "a\nc")

    class C:
        @classproperty
        def name(cls):
            return cls.__name__

    assert C.name == "C" and C().name == "C"


def test_filter_quantized_module_map_scopes_conversion():
    # GIVEN the global map and a filter excluding Linear counterparts
    import flax.nnx as nnx
    from fastforward_tpu import nn as ffnn

    full = ffnn.quantized_module_map()
    assert nnx.Linear in full
    # WHEN filtering inside the context
    with ffnn.filter_quantized_module_map(lambda base, q: base is not nnx.Linear):
        filtered = ffnn.quantized_module_map()
        # THEN Linear is hidden, other entries remain
        assert nnx.Linear not in filtered
        assert len(filtered) == len(full) - 1
    # AND the map is restored on exit
    assert nnx.Linear in ffnn.quantized_module_map()
