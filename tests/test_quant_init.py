"""Quantizer initialization tests. Modeled on reference
`tests/quantization/test_quant_init.py`."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.quant_init import QuantizationConfig, find_quantizers


class MLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(4, 8, rngs=rngs)
        self.fc2 = nnx.Linear(8, 2, rngs=rngs)


@pytest.fixture
def model():
    m = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(m)
    return m


def test_find_quantizers_by_tag(model):
    collection = find_quantizers(model, "**/[quantizer:parameter/weight]")
    assert len(collection) == 2
    assert all(isinstance(i.module, ffnn.QuantizerStub) for i in collection)


def test_find_quantizers_by_name(model):
    collection = find_quantizers(model, "fc1/output_quantizer")
    assert collection.paths == ["fc1/output_quantizer"]


def test_initialize_replaces_stubs(model):
    collection = find_quantizers(model, "**/[quantizer:parameter/weight]")
    collection.initialize(ffnn.LinearQuantizer, num_bits=4, symmetric=True)
    assert isinstance(model.fc1.weight_quantizer, ffnn.LinearQuantizer)
    assert model.fc1.weight_quantizer.num_bits == 4
    # Metadata from the stub slot is preserved
    assert model.fc1.weight_quantizer.quant_metadata.matches_tag("parameter/weight")


def test_initialize_overwrite_policies(model):
    collection = find_quantizers(model, "fc1/weight_quantizer")
    collection.initialize(ffnn.LinearQuantizer, num_bits=8)

    fresh = find_quantizers(model, "fc1/weight_quantizer")
    with pytest.raises(ff.QuantizationError, match="already initialized"):
        fresh.initialize(ffnn.LinearQuantizer, overwrite_policy="error", num_bits=4)

    fresh.initialize(ffnn.LinearQuantizer, overwrite_policy="skip", num_bits=4)
    assert model.fc1.weight_quantizer.num_bits == 8

    fresh.initialize(ffnn.LinearQuantizer, overwrite_policy="overwrite", num_bits=4)
    assert model.fc1.weight_quantizer.num_bits == 4


def test_quantization_config_precedence(model):
    config = QuantizationConfig()
    config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer, num_bits=8)
    # Later rule wins for fc2
    config.add_rule("fc2/weight_quantizer", ffnn.LinearQuantizer, num_bits=4)
    config.initialize(model)
    assert model.fc1.weight_quantizer.num_bits == 8
    assert model.fc2.weight_quantizer.num_bits == 4


def test_config_end_to_end_quantized_forward(model):
    config = QuantizationConfig()
    config.add_rule("**/[quantizer:parameter]", ffnn.LinearQuantizer, num_bits=8, symmetric=True)
    config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer, num_bits=8, symmetric=False)
    config.initialize(model)
    # Set ranges on all quantizers (normally done by range estimation)
    for _, q in ffnn.named_quantizers(model):
        if isinstance(q, ffnn.LinearQuantizer):
            q.quantization_range = (-3.0, 3.0)
    x = jnp.asarray(np.random.randn(2, 4), dtype=jnp.float32)
    h = model.fc1(x)
    assert isinstance(h, ff.QuantizedArray)
