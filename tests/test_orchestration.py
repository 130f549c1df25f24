"""Orchestration tests: trace, registry, ops YAML spec."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn, orchestration
from fastforward_tpu.algorithms import gptq
from fastforward_tpu.ops.spec import operator_table_to_yaml


class MLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(8, 16, rngs=rngs)
        self.fc2 = nnx.Linear(16, 4, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
        return self.fc2(h)


def test_trace_produces_graph():
    model = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), dtype=jnp.float32)
    graph = orchestration.trace(model, x)
    assert graph.num_equations > 0
    assert "dot_general" in graph.primitive_counts
    assert ("fc1", "QuantizedLinear") in graph.module_inventory
    assert "equations:" in graph.summary()


def test_algorithm_registry():
    orchestration.register("gptq-linears", gptq, "**/[cls:QuantizedLinear]", num_bits=4)
    model = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    spec, targets = orchestration.resolve(model, "gptq-linears")
    assert spec.kwargs == {"num_bits": 4}
    assert len(targets) == 2
    assert "gptq-linears" in orchestration.registered_algorithms()


def test_operator_yaml_spec():
    text = operator_table_to_yaml()
    assert "linear(input: Quantized" in text
    assert "fallback: fastforward_tpu.ops.operators.linear" in text
    import yaml

    entries = yaml.safe_load(text)
    names = {e["op"].split("(")[0] for e in entries}
    assert {"linear", "softmax", "matmul", "conv2d"} <= names
