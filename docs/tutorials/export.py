# %% [markdown]
# # Exporting quantized models
#
# Executable form of `docs/export.md` (parity with the reference's
# `docs/examples/export_llama.nb.py` + `export_pipeline.nb.py`; runs under
# `--include-slow`). A quantized model exports as a **StableHLO program**
# (the XLA-ecosystem role of the reference's ONNX artifact) plus the same
# side-channel **encodings JSON** the reference's QNN pipeline emits.

# %%
import json
import os
import tempfile

import jax

if os.environ.get("FF_TUTORIAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn

# %% [markdown]
# ## Quantize and calibrate a small network


# %%
class Net(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(16, 32, rngs=rngs)
        self.fc2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
        h = jax.nn.relu(h)
        out = self.fc2(h)
        return out.dequantize() if isinstance(out, ff.QuantizedArray) else out


model = Net(rngs=nnx.Rngs(0))
x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)

ffnn.quantize_model(model)
config = ff.QuantizationConfig()
config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=True, granularity=ff.PerChannel(1))
config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=False)
config.initialize(model)
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(x)
    q_out = np.asarray(model(x))

# %% [markdown]
# ## export(): StableHLO + encodings sidecar
#
# The forward is staged under `export_mode(True)` — every quantizer emits
# quantize→dequantize'd plain arrays, so the artifact is a dense-dtype
# program with explicit QDQ, exactly the reference's export semantics.

# %%
from fastforward_tpu.export import export

tmp = tempfile.mkdtemp()
with ff.flags.strict_quantization(False):
    paths = export(model, (x,), tmp, name="net", schema="v1")
print({k: os.path.basename(v) for k, v in paths.items()})
assert os.path.exists(paths["mlir"])
assert "stablehlo" in open(paths["mlir"]).read()

enc = json.load(open(paths["encodings"]))
print(f"v1 schema: {len(enc['encodings'])} encodings, "
      f"version {enc['version']}")
assert any(e["enc_type"] == "PER_CHANNEL" for e in enc["encodings"]), enc

# %% [markdown]
# ## Round-trip: the serialized artifact reproduces the quantized outputs

# %%
restored = jax.export.deserialize(open(paths["serialized"], "rb").read())
out2 = np.asarray(restored.call(x)[0] if isinstance(restored.call(x), tuple)
                  else restored.call(x))
np.testing.assert_allclose(out2, q_out, rtol=1e-5, atol=1e-5)
print("serialized round-trip bit-parity OK")

# %% [markdown]
# ## Schemas: legacy / v1 / v2 (+ LPBQ)
#
# `v2` adds per-block entries; LPBQ re-expresses per-block scales as
# per-block INT multipliers × a per-channel float scale.

# %%
from fastforward_tpu.export import LPBQProcessor

with ff.flags.strict_quantization(False):
    p_legacy = export(model, (x,), tmp, name="net_legacy", schema="legacy")
    p_v2 = export(model, (x,), tmp, name="net_v2", schema="v2",
                  lpbq=LPBQProcessor(compressed_bw=4, decompressed_bw=8))
legacy = json.load(open(p_legacy["encodings"]))
v2 = json.load(open(p_v2["encodings"]))
assert "param_encodings" in legacy and "activation_encodings" in legacy
assert v2["version"].startswith("2."), v2["version"]

# %% [markdown]
# ## Per-module export
#
# `export_modules` captures each matching module's real input from a
# sample forward and exports it standalone.

# %%
from fastforward_tpu.export import export_modules

with ff.flags.strict_quantization(False):
    per_mod = export_modules(
        model, (x,), "**/[cls:QuantizedLinear]", tmp,
        context={"QuantizedLinear": ffnn.QuantizedLinear},
    )
print("module exports:", sorted(per_mod))
assert len(per_mod) == 2
for name, files in per_mod.items():
    assert os.path.exists(files["mlir"]), name

# %% [markdown]
# ## Pipeline registry
#
# Export targets resolve through a stage pipeline (capture golden → stage
# program → validate → write), reference `export/pipeline.py` parity.

# %%
from fastforward_tpu.export.pipeline import run_export_pipeline

with ff.flags.strict_quantization(False):
    ctx = run_export_pipeline(model, (x,), tmp, name="net_pipe",
                              target="tpu", format="stablehlo")
assert ctx.artifacts, ctx
print("pipeline artifacts:", sorted(ctx.artifacts))
print("export tutorial OK")
