# %% [markdown]
# # Export pipelines: the DAG layer under `export`
#
# Executable walkthrough of the pipeline machinery beneath the high-level
# export (parity with the reference's `docs/examples/export_pipeline.nb.py`;
# the repo analog of its QNN/ONNX pipeline is the StableHLO pipeline). A
# `Pipeline` is a DAG of named *stages* executing in topological order over
# a shared `ExportContext`; a `PipelineRegistry` resolves pipelines by
# `(target, format)`. By the end you will have:
#
# 1. built a pipeline from scratch,
# 2. run the built-in StableHLO pipeline directly (no `export()` wrapper),
# 3. spliced, replaced, and rewired stages, and
# 4. registered your own pipeline factory so `run_export_pipeline` finds it.

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
from fastforward_tpu.export.pipeline import (
    ExportContext,
    Pipeline,
    PipelineRegistry,
    build_stablehlo_pipeline,
    run_export_pipeline,
)

# %% [markdown]
# ## 1. A pipeline from scratch
#
# Stages are plain callables over the context. Dependencies (`after=`)
# define the DAG; execution is any topological order.

# %%
trace = []


def make_stage(tag):
    def stage(ctx):
        trace.append(tag)
        ctx.artifacts[tag] = f"ran {tag}"
    return stage


p = (
    Pipeline("demo")
    .add_stage("load", make_stage("load"))
    .add_stage("transform", make_stage("transform"), after=("load",))
    .add_stage("write", make_stage("write"), after=("transform",))
)
ctx = ExportContext(model=None, sample_args=(), output_dir=".", name="demo")
p.run(ctx)
assert trace == ["load", "transform", "write"]
print("stage order:", p.stage_order())

# %% [markdown]
# ## 2. The built-in StableHLO pipeline, run directly
#
# `build_stablehlo_pipeline` assembles the same stage kinds the reference's
# ONNX pipeline uses: capture a golden output, stage/serialize the program,
# validate the artifact against the golden.

# %%
class Net(nnx.Module):
    def __init__(self, *, rngs):
        self.fc = nnx.Linear(16, 8, rngs=rngs)

    def __call__(self, x):
        out = self.fc(x)
        return out.dequantize() if isinstance(out, ff.QuantizedArray) else out


model = Net(rngs=nnx.Rngs(0))
x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
ffnn.quantize_model(model)
cfg = ff.QuantizationConfig()
cfg.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
             num_bits=8, symmetric=True)
cfg.initialize(model)
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(x)

tmp = tempfile.mkdtemp()
pipeline = build_stablehlo_pipeline()
print("built-in stages:", pipeline.stage_order())
with ff.flags.strict_quantization(False):
    ctx = pipeline.run(ExportContext(
        model=model, sample_args=(x,), output_dir=tmp, name="net",
    ))
print("validated:", ctx.artifacts["validated"])

# %% [markdown]
# ## 3. Manipulating an existing pipeline
#
# `insert_stage_before` splices a stage into the chain (the target inherits
# a dependency on it); `insert_stage_after` rewires the target's dependents
# to the new stage; `replace_stage` swaps a callable in place;
# `add_dependency` / `remove_dependency` edit edges (cycles are rejected at
# the call site).

# %%
audit = []


def stage_audit(ctx):
    audit.append(sorted(ctx.artifacts))


pipeline2 = build_stablehlo_pipeline()
pipeline2.insert_stage_after("capture_golden", stage_audit, "audit")
print("with audit:", pipeline2.stage_order())
with ff.flags.strict_quantization(False):
    pipeline2.run(ExportContext(
        model=model, sample_args=(x,), output_dir=tempfile.mkdtemp(),
        name="net",
    ))
assert audit and "golden_output" in audit[0]

# Replace validation with a stricter one, in place.
def strict_validate(ctx):
    assert ctx.artifacts["validated" if "validated" in ctx.artifacts else "golden_output"] is not None
    ctx.artifacts["strict_validated"] = True


pipeline2.replace_stage("validate", strict_validate)

# %% [markdown]
# ## 4. Registering a custom pipeline factory
#
# The registry is how `run_export_pipeline(target=..., format=...)` finds a
# pipeline — registering a factory plugs a whole new export flavor in.

# %%
def build_manifest_pipeline() -> Pipeline:
    def stage_manifest(ctx):
        path = os.path.join(ctx.output_dir, f"{ctx.name}.manifest.json")
        with open(path, "w") as f:
            json.dump({"name": ctx.name, "inputs": len(ctx.sample_args)}, f)
        ctx.artifacts["manifest"] = path

    p = build_stablehlo_pipeline()
    p.insert_stage_after("stage_program", stage_manifest, "manifest")
    return p


registry = PipelineRegistry()
registry.register("tpu", "stablehlo", build_stablehlo_pipeline)
registry.register("tpu", "stablehlo+manifest", build_manifest_pipeline)

out_dir = tempfile.mkdtemp()
with ff.flags.strict_quantization(False):
    ctx = run_export_pipeline(
        model, (x,), out_dir, name="net", target="tpu",
        format="stablehlo+manifest", registry=registry,
    )
print("manifest:", json.load(open(ctx.artifacts["manifest"])))
assert os.path.exists(ctx.artifacts["manifest"])
print("export pipeline tutorial OK")
