"""Export tests. Modeled on reference `tests/export/test_export.py` and
`test_export_schemas.py`: real staging on tiny models, schema validation,
LPBQ round-trip."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.export import (
    LegacySchemaHandler,
    LPBQProcessor,
    QuantizerEncoding,
    V2SchemaHandler,
    collect_encodings,
    export,
)


class MLP(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(8, 16, rngs=rngs)
        self.fc2 = nnx.Linear(16, 4, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
        return self.fc2(h)


@pytest.fixture
def calibrated_model():
    model = MLP(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    config = ff.QuantizationConfig()
    config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=True, granularity=ff.PerChannel(1))
    config.add_rule("**/[quantizer:activation/output]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(model)
    for _, q in ffnn.named_quantizers(model):
        if isinstance(q, ffnn.LinearQuantizer):
            n = q.granularity.parameter_dimensionality((16, 16))
            q.quantization_range = (-2.0, 2.0)
    return model


def test_export_writes_stablehlo_and_encodings(tmp_path, calibrated_model):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), dtype=jnp.float32)
    paths = export(calibrated_model, (x,), str(tmp_path), name="mlp")
    mlir = open(paths["mlir"]).read()
    assert "stablehlo" in mlir or "func.func" in mlir
    # Export mode stages QDQ: round/clamp ops present, no custom types
    assert "round_nearest_even" in mlir or "round" in mlir
    enc = json.load(open(paths["encodings"]))
    assert enc["version"] == "1.0.0"
    names = {e["name"] for e in enc["encodings"]}
    assert any("fc1/weight_quantizer" in n for n in names)


def test_collect_encodings(calibrated_model):
    encodings = collect_encodings(calibrated_model)
    by_name = {e.name: e for e in encodings}
    wq = by_name["fc1/weight_quantizer"]
    assert wq.num_bits == 8
    assert wq.symmetric
    assert wq.offset is None


def test_legacy_schema():
    e = QuantizerEncoding(
        name="layer.weight", num_bits=8, scale=np.array([0.1, 0.2]),
        offset=None, granularity=ff.PerChannel(0), symmetric=True,
    )
    out = LegacySchemaHandler().encode([e])
    entries = out["param_encodings"]["layer.weight"]
    assert len(entries) == 2
    np.testing.assert_allclose(entries[0]["max"], 127 * 0.1)


def test_v2_schema_per_block():
    e = QuantizerEncoding(
        name="w", num_bits=4, scale=np.arange(1, 9, dtype=np.float64).reshape(-1),
        offset=None,
        granularity=ff.PerBlock(block_dims=0, block_sizes=16, per_channel_dims=1),
        symmetric=True, data_shape=(128, 1),
    )
    out = V2SchemaHandler().encode([e])
    entry = out["encodings"][0]
    assert entry["enc_type"] == "PER_BLOCK"
    assert entry["block_size"] == [16, 1]


def test_lpbq_roundtrip():
    # GIVEN per-block scales (8 blocks × 4 channels)
    rng = np.random.RandomState(0)
    grid = (8, 4)
    scales = rng.uniform(0.01, 0.5, size=grid)
    e = QuantizerEncoding(
        name="w", num_bits=4, scale=scales.reshape(-1), offset=None,
        granularity=ff.PerBlock(block_dims=0, block_sizes=16, per_channel_dims=1),
        symmetric=True, data_shape=(128, 4),
    )
    lpbq = LPBQProcessor(compressed_bw=4, decompressed_bw=8)
    entry = lpbq.process(e)
    assert max(entry["per_block_int_scale"]) <= 15
    rebuilt = lpbq.reconstruct(entry, grid, ch_axes=(1,))
    # reconstruction error bounded by the 4-bit scale grid
    rel = np.abs(rebuilt - scales) / scales.max(axis=0, keepdims=True)
    assert rel.max() < 0.5 / 15 + 1e-6 + 0.04


def test_exported_program_runs(tmp_path, calibrated_model):
    import jax

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), dtype=jnp.float32)
    paths = export(calibrated_model, (x,), str(tmp_path), name="mlp")
    with open(paths["serialized"], "rb") as f:
        rehydrated = jax.export.deserialize(f.read())
    out = rehydrated.call(x)
    with ff.flags.export_mode(True), ff.strict_quantization(False):
        expected = calibrated_model(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_export_pipeline_dag(tmp_path, calibrated_model):
    from fastforward_tpu.export.pipeline import (
        Pipeline, PipelineRegistry, run_export_pipeline)
    from fastforward_tpu.exceptions import ExportError

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), dtype=jnp.float32)
    ctx = run_export_pipeline(calibrated_model, (x,), str(tmp_path), name="m")
    assert ctx.artifacts["validated"] is True
    assert "encodings" in ctx.artifacts

    # DAG mechanics: cycle and unknown-dep detection
    p = Pipeline("t")
    p.add_stage("a", lambda c: None)
    with pytest.raises(ExportError, match="unknown stage"):
        p.add_stage("b", lambda c: None, after=("zzz",))
    reg = PipelineRegistry()
    with pytest.raises(ExportError, match="No export pipeline"):
        reg.resolve("qnn", "onnx")


def test_export_carries_producing_operator_metadata(tmp_path):
    # Per-op metadata in exported encodings (reference
    # `quantizer_annotations.py:63-99` feeding `onnx_export_stages.py:532`).
    import json

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn
    from fastforward_tpu.export.stablehlo import export

    class M(nnx.Module):
        def __init__(self, rngs):
            self.fc = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x):
            out = self.fc(x)
            return out.dequantize() if isinstance(out, ff.QuantizedArray) else out

    model = M(nnx.Rngs(0))
    ffnn.quantize_model(model)
    cfg = ff.QuantizationConfig()
    cfg.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                 num_bits=8, symmetric=True)
    cfg.add_rule("**/[quantizer:activation/output]", ffnn.LinearQuantizer,
                 num_bits=8, symmetric=False)
    cfg.initialize(model)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
    with ff.flags.strict_quantization(False):
        with ff.estimate_ranges(model, ff.range_setting.running_minmax):
            model(x)
        paths = export(model, (x,), str(tmp_path), schema="v1")

    enc = json.loads(open(paths["encodings"]).read())
    by_name = {e["name"]: e for e in enc["encodings"]}
    out_q = [e for n, e in by_name.items() if "output_quantizer" in n]
    assert out_q and out_q[0].get("op") == "linear", by_name
