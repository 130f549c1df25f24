# %% [markdown]
# # Autoquant — quantizing op calls the module system cannot see
#
# Executable form of `docs/autoquant.md` (parity with the reference's
# `docs/examples/autoquant_llama.nb.py`; runs under `--include-slow`).
# Two passes, two blind-spot classes:
#
# 1. **Namespace substitution** (`ff.autoquantize`): function-level calls
#    (`jax.nn.relu`, `jnp.matmul`, ...) inside a converted module get
#    quantizer slots addressable from `QuantizationConfig`.
# 2. **Jaxpr pass** (`ff.trace_quantization_sites`): operator syntax
#    (`x @ w`), pre-bound functions, and ops inside `lax.scan`/`cond` —
#    everything is an equation once traced.

# %%
import os

import jax

if os.environ.get("FF_TUTORIAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn

# %% [markdown]
# ## 1. Namespace autoquant on a module
#
# The model calls `jax.nn.relu` and `jax.nn.softmax` as plain functions —
# no module, so `quantize_model` alone cannot place quantizers on them.


# %%
class Net(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(16, 32, rngs=rngs)
        self.fc2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
        h = jax.nn.relu(h)            # function-level call: autoquant site
        out = self.fc2(h)
        out = out.dequantize() if isinstance(out, ff.QuantizedArray) else out
        return jax.nn.softmax(out, axis=-1)   # another site


model = Net(rngs=nnx.Rngs(0))
x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
fp_out = np.asarray(model(x))

ff.autoquantize(model, x)
print("autoquant sites:", sorted(model.autoquant_quantizers))
assert "relu_0" in model.autoquant_quantizers
assert "softmax_0" in model.autoquant_quantizers

# %% [markdown]
# Place quantizers on module slots AND autoquant slots with one config.

# %%
config = ff.QuantizationConfig()
config.add_rule("**/[quantizer:parameter]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=True)
config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=False)
config.add_rule("autoquant_quantizers/*", ffnn.LinearQuantizer,
                num_bits=8, symmetric=False)
config.initialize(model)

with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(x)
    q_out = model(x)
q_out = np.asarray(
    q_out.dequantize() if isinstance(q_out, ff.QuantizedArray) else q_out
)
s = float(ff.sqnr(fp_out, q_out))
print(f"autoquantized SQNR vs fp32: {s:.1f} dB")
assert s > 15, s

# %% [markdown]
# ## 2. Jaxpr pass — operator syntax and control flow
#
# `x @ w` never goes through a patched namespace attribute, and a matmul
# inside `lax.scan` (the layer-stacked transformer idiom) is invisible to
# any source-level pass. After `jax.make_jaxpr` both are plain
# `dot_general` equations; the plan records sites, calibrates running
# absmax per slot (folding across every scan iteration), and re-stages the
# function with QDQ inserted — still a scan, still jittable.


# %%
def scanned_mlp(x, ws):
    def body(h, w):
        return jax.nn.tanh(h @ w), ()        # operator syntax, inside scan

    h, _ = jax.lax.scan(body, x, ws)
    return h


rng = np.random.RandomState(1)
xs = jnp.asarray(rng.randn(4, 16).astype(np.float32))
ws = jnp.asarray(rng.randn(3, 16, 16).astype(np.float32) * 0.3)

plan = ff.trace_quantization_sites(scanned_mlp, xs, ws)
print(plan.summary())
assert [s.name for s in plan.sites] == ["dot_general_0"]
assert plan.sites[0].context == ("scan",)    # found INSIDE the scan body

ref = plan.observe(xs, ws)                   # calibration run
qfn = jax.jit(plan.quantized(num_bits=8))    # QDQ'd, jittable
out = np.asarray(qfn(xs, ws))
np.testing.assert_allclose(out, np.asarray(ref), rtol=0.2, atol=0.2)
assert "scan" in str(jax.make_jaxpr(plan.quantized())(xs, ws))
print("jaxpr-pass QDQ matches fp within int8 noise; scan preserved")

# %% [markdown]
# ## Bridging the jaxpr plan and the module quantizer stack
#
# Tracing under `scoped_forward(model)` stamps each site with the module
# that executed it, connecting the two worlds: a module-path
# `QuantizationConfig` can drive quantizer installation on the plan
# (`install_from_config`), and a calibrated plan can push its quantizers
# back onto the model's slots (`apply_to_module`).

# %%
from flax import nnx

from fastforward_tpu import nn as ffnn, range_setting
from fastforward_tpu.autoquant_jaxpr import scoped_forward


class TinyNet(nnx.Module):
    def __init__(self, *, rngs):
        self.fc1 = nnx.Linear(16, 32, rngs=rngs)
        self.fc2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        return self.fc2(jax.nn.relu(self.fc1(x)))


model = TinyNet(rngs=nnx.Rngs(0))
x = jnp.asarray(np.random.RandomState(2).randn(4, 16), jnp.float32)
with scoped_forward(model):
    plan2 = ff.trace_quantization_sites(lambda x: model(x), x)
print({s.name: s.module_path for s in plan2.sites})
assert plan2.sites[0].module_path == "fc1"

# a module-path config drives the plan's quantizer installation
ffnn.quantize_model(model)
qcfg = ff.QuantizationConfig()
qcfg.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
              num_bits=8, symmetric=True)
plan2.install_from_config(qcfg, model,
                          estimator=range_setting.running_minmax)
plan2.observe(x)

# ...and the calibrated plan pushes its quantizers onto the module slots
applied = plan2.apply_to_module(model)
print("module slots calibrated from the plan:", applied)
assert applied == 2

print("autoquant tutorial OK")
