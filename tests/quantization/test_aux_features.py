"""Tests for freeze, scoped strict quantization, quantizer annotations,
random quantized arrays, and the testing helpers."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.quantization.freeze import freeze_parameters, unfreeze
from fastforward_tpu.quantization.quantizer_annotations import annotate_operator_metadata
from fastforward_tpu.quantization.random import random_quantized
from fastforward_tpu.quantization.strict_quantization import strict_quantization_for_module
from fastforward_tpu.testing import (
    initialize_quantizers_to_linear_quantizer,
    is_close_to_rounding,
    seed_prngs,
)


def _calibrated_linear():
    model = nnx.Linear(8, 4, rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    initialize_quantizers_to_linear_quantizer(model, num_bits=8)
    return model


def test_freeze_bakes_weights():
    model = _calibrated_linear()
    w_before = np.asarray(model.kernel.value).copy()
    handles = freeze_parameters(model)
    w_frozen = np.asarray(model.kernel.value)
    # weight changed (quantization baked in) and is on the grid
    assert not np.allclose(w_frozen, w_before)
    scale = float(model.weight_quantizer.scale.value[0])
    np.testing.assert_allclose(
        w_frozen / scale, np.round(w_frozen / scale), atol=1e-4
    )
    # the weight quantizer is short-circuited now
    out = model.weight_quantizer(jnp.asarray(w_frozen))
    assert not isinstance(out, ff.QuantizedArray)
    unfreeze(handles)
    out = model.weight_quantizer(jnp.asarray(w_frozen))
    assert isinstance(out, ff.QuantizedArray)


def test_strict_quantization_for_module():
    model = _calibrated_linear()
    plain = nnx.Linear(8, 4, rngs=nnx.Rngs(1))
    x = jnp.ones((2, 8))
    # plain module raises nothing; scoped strict=False lets a quantized model
    # run inside a strict context
    with ff.strict_quantization(True):
        with strict_quantization_for_module(plain, False):
            out = plain(x)
    assert out.shape == (2, 4)
    # and scoped strict=True forces errors inside a non-strict context
    stub_model = nnx.Linear(8, 4, rngs=nnx.Rngs(2))
    ffnn.quantize_model(stub_model)
    with ff.strict_quantization(False):
        with strict_quantization_for_module(stub_model, True):
            with pytest.raises(ff.QuantizationError):
                stub_model(x)
        stub_model(x)  # removed again → non-strict applies


def test_annotate_operator_metadata():
    model = _calibrated_linear()
    annotate_operator_metadata(model, jnp.ones((2, 8)))
    meta = model.output_quantizer.quant_metadata
    assert getattr(meta, "producing_operator", None) == "linear"


def test_random_quantized():
    qa = random_quantized((4, 8), num_bits=4, granularity=ff.PerChannel(0))
    assert isinstance(qa, ff.QuantizedArray)
    assert qa.shape == (4, 8)
    raw = np.asarray(qa.raw_data)
    assert raw.max() <= 7 and raw.min() >= -8


def test_is_close_to_rounding():
    flags = np.asarray(is_close_to_rounding(jnp.array([0.5, 0.3, 1.49999])))
    assert flags.tolist() == [True, False, True]


def test_seed_prngs():
    key = seed_prngs(7)
    assert key.shape == (2,)
