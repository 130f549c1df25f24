"""Quantization state save/load tests. Modeled on reference
`tests/nn/test_quantized_module_quantization_state.py` (safetensors/YAML
round-trip, shared + lazy quantizers)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.utils import serialization
from fastforward_tpu.utils.checkpoint import load_quantization_state, save_quantization_state


def test_yamlable_roundtrip():
    gran = ff.PerBlock(block_dims=1, block_sizes=64, per_channel_dims=0)
    text = serialization.dump(gran)
    restored = serialization.load(text)
    assert restored == gran


def test_yamlable_nested():
    text = serialization.dump({"g": ff.PerChannel((0, 2))})
    restored = serialization.load(text)
    assert restored["g"] == ff.PerChannel((0, 2))


class MLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(8, 16, rngs=rngs)
        self.fc2 = nnx.Linear(16, 4, rngs=rngs)


def _quantized_mlp(initialized=True):
    model = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    config = ff.QuantizationConfig()
    config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                    num_bits=4, symmetric=True, granularity=ff.PerChannel(1))
    config.add_rule("**/[quantizer:activation/output]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(model)
    if initialized:
        model.fc1.weight_quantizer.quantization_range = (
            jnp.full((16,), -1.0), jnp.full((16,), 1.0))
        model.fc2.weight_quantizer.quantization_range = (
            jnp.full((4,), -0.5), jnp.full((4,), 0.5))
        model.fc1.output_quantizer.quantization_range = (-3.0, 3.0)
        model.fc2.output_quantizer.quantization_range = (-2.0, 4.0)
    return model


def test_save_load_roundtrip(tmp_path):
    model = _quantized_mlp()
    save_quantization_state(model, str(tmp_path / "state"))

    fresh = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    load_quantization_state(fresh, str(tmp_path / "state"))

    q = fresh.fc1.weight_quantizer
    assert isinstance(q, ffnn.LinearQuantizer)
    assert q.num_bits == 4
    assert q.granularity == ff.PerChannel(1)
    np.testing.assert_allclose(
        np.asarray(q.scale.value), np.asarray(model.fc1.weight_quantizer.scale.value)
    )
    # asymmetric output quantizer keeps its offset
    oq = fresh.fc2.output_quantizer
    assert oq.offset is not None
    mn, mx = oq.quantization_range
    np.testing.assert_allclose(float(np.asarray(mn).squeeze()), -2.0, rtol=1e-5)


def test_save_lazy_quantizer(tmp_path):
    model = _quantized_mlp(initialized=False)
    # lazy params are opt-in at save AND at load (reference
    # `quantized_module.py:446-470` allow_lazy_params protocol)
    with pytest.raises(ff.QuantizationError, match="lazy"):
        save_quantization_state(model, str(tmp_path / "state"))
    save_quantization_state(
        model, str(tmp_path / "state"), allow_lazy_params=True
    )
    fresh = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    with pytest.raises(ff.QuantizationError, match="lazy"):
        load_quantization_state(fresh, str(tmp_path / "state"))
    load_quantization_state(
        fresh, str(tmp_path / "state"), allow_lazy_params=True
    )
    assert isinstance(fresh.fc1.weight_quantizer, ffnn.LinearQuantizer)
    assert fresh.fc1.weight_quantizer.has_uninitialized_params


def test_shared_quantizer_dedup(tmp_path):
    model = _quantized_mlp()
    shared = model.fc1.output_quantizer
    model.fc2.output_quantizer = shared  # share one quantizer object
    save_quantization_state(model, str(tmp_path / "state"))

    fresh = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    load_quantization_state(fresh, str(tmp_path / "state"))
    assert fresh.fc1.output_quantizer is fresh.fc2.output_quantizer


def test_overwrite_policy_error(tmp_path):
    model = _quantized_mlp()
    save_quantization_state(model, str(tmp_path / "state"))
    with pytest.raises(ff.QuantizationError, match="already initialized"):
        load_quantization_state(model, str(tmp_path / "state"), overwrite_policy="error")


def test_stubs_not_saved(tmp_path):
    model = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)  # stubs only
    save_quantization_state(model, str(tmp_path / "state"))
    import yaml

    with open(tmp_path / "state" / "config.yaml") as f:
        saved = yaml.safe_load(f)
    assert saved["quantizers"] == {}


def test_granularity_yamlable_regardless_of_import_order(tmp_path):
    # Regression: granularities are @yamlable at class definition, so
    # instances constructed before utils.serialization is imported still
    # serialize (previously a lazy _register_core() left early instances
    # without recorded init args and save_quantization_state raised).
    g = ff.PerTensor()
    assert hasattr(g, "_yaml_init_args")
    from fastforward_tpu.utils import serialization

    text = serialization.dump({"g": g, "b": ff.PerBlock(0, 64, 1)})
    restored = serialization.load(text)
    assert restored["g"] == ff.PerTensor()
    assert restored["b"] == ff.PerBlock(0, 64, 1)


def test_orbax_roundtrip_quantized_pytree(tmp_path):
    # GIVEN a pytree with a QuantizedArray leaf (frozen low-bit weights)
    import jax.numpy as jnp

    from fastforward_tpu.quantization import quantize_per_tensor
    from fastforward_tpu.utils.checkpoint import load_params, save_params

    qa = quantize_per_tensor(jnp.arange(8.0).reshape(2, 4), scale=0.1, num_bits=8)
    params = {"layer": {"w": qa, "b": jnp.ones((4,), jnp.float32)}}
    # WHEN saving and restoring with a template
    save_params(params, str(tmp_path / "ckpt"))
    restored = load_params(str(tmp_path / "ckpt"), template=params)
    # THEN the quantized leaf round-trips with dtype and grid intact
    assert type(restored["layer"]["w"]) is type(qa)
    assert restored["layer"]["w"].raw_data.dtype == qa.raw_data.dtype
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(restored["layer"]["w"].dequantize()),
        np.asarray(qa.dequantize()),
    )


def test_state_name_or_path_mismatch_warns(tmp_path):
    """Identity recording + mismatch warning (reference
    `test_quantized_module_quantization_state.py:259-290`)."""
    import warnings

    model = _quantized_mlp()
    save_quantization_state(
        model, str(tmp_path / "state"), name_or_path="llama-8b"
    )
    fresh = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_quantization_state(
            fresh, str(tmp_path / "state"), name_or_path="gpt2"
        )
    assert any("llama-8b" in str(x.message) for x in w)
    # matching identity: silent
    fresh2 = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_quantization_state(
            fresh2, str(tmp_path / "state"), name_or_path="llama-8b"
        )
    assert not any("saved for" in str(x.message) for x in w)


def test_state_missing_files_error(tmp_path):
    """Clean errors for missing config/tensor files (reference `:205-233`)."""
    model = _quantized_mlp()
    with pytest.raises(ff.QuantizationError, match="config not found"):
        load_quantization_state(model, str(tmp_path / "nowhere"))
    save_quantization_state(model, str(tmp_path / "state"))
    (tmp_path / "state" / "quantizers.safetensors").unlink()
    with pytest.raises(ff.QuantizationError, match="tensors not found"):
        load_quantization_state(model, str(tmp_path / "state"))


def test_state_unsupported_version_errors(tmp_path):
    """Version gate (reference `:235-257`)."""
    import yaml

    model = _quantized_mlp()
    save_quantization_state(model, str(tmp_path / "state"))
    cfg = tmp_path / "state" / "config.yaml"
    saved = yaml.safe_load(cfg.read_text())
    saved["version"] = "99.0"
    cfg.write_text(yaml.safe_dump(saved))
    fresh = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    with pytest.raises(ff.QuantizationError, match="version"):
        load_quantization_state(fresh, str(tmp_path / "state"))


def test_state_overwrite_policy_skip(tmp_path):
    """policy="skip" leaves an existing quantizer untouched (reference
    `:338-380` load-into-existing protocol)."""
    model = _quantized_mlp()
    save_quantization_state(model, str(tmp_path / "state"))
    existing = model.fc1.weight_quantizer
    load_quantization_state(
        model, str(tmp_path / "state"), overwrite_policy="skip"
    )
    assert model.fc1.weight_quantizer is existing
