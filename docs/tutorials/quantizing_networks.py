# %% [markdown]
# # Quantizing networks
#
# Executable form of `docs/quantizing_networks.md` (mirrors the reference's
# `docs/examples/quantizing_networks.nb.py` notebook-as-test pattern; runs
# in the suite under `--include-slow`). Walks the whole lifecycle on a
# small MLP: convert → configure → calibrate → run/train → save/load →
# GPTQ.

# %%
import os
import tempfile

import jax

if os.environ.get("FF_TUTORIAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn

# %% [markdown]
# ## 1. Convert
#
# `quantize_model` swaps every module whose type has a registered quantized
# counterpart and installs `QuantizerStub` slots. `summarize_quantizers`
# shows what was installed.


# %%
class Net(nnx.Module):
    def __init__(self, rngs):
        self.fc1 = nnx.Linear(16, 32, rngs=rngs)
        self.fc2 = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        h = h.dequantize() if isinstance(h, ff.QuantizedArray) else h
        h = jax.nn.relu(h)
        out = self.fc2(h)
        return out.dequantize() if isinstance(out, ff.QuantizedArray) else out


model = Net(nnx.Rngs(0))
x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
fp_out = np.asarray(model(x))

ffnn.quantize_model(model)
summary = ffnn.summarize_quantizers(model)
print(summary)
assert "fc1" in str(summary)

# %% [markdown]
# ## 2. Configure
#
# Quantizer placement is declarative: mpath queries → quantizer factories.
# Later rules win.

# %%
config = ff.QuantizationConfig()
config.add_rule("**/[quantizer:parameter]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=True)
config.add_rule("**/[cls:Linear]/[quantizer:parameter/weight]",
                ffnn.LinearQuantizer, num_bits=4, symmetric=True,
                granularity=ff.PerChannel(1))
config.add_rule("**/[quantizer:activation]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=False)
config.initialize(model)

# %% [markdown]
# ## 3. Calibrate

# %%
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(x)
    q_out = model(x)
s = float(ff.sqnr(fp_out, q_out))
print(f"post-calibration SQNR: {s:.1f} dB")
assert s > 15, s

# %% [markdown]
# ## 4. Run / train
#
# Strict quantization raises on silently-unquantized ops; QAT works with
# plain `jax.grad` (clipped-STE data gradient, LSQ scale gradient).

# %%
graphdef, state = nnx.split(model)
opt = optax.sgd(1e-3)
opt_state = opt.init(state)
y = jnp.asarray(np.random.RandomState(1).randn(4, 8), jnp.float32)


@jax.jit
def train_step(state, opt_state):
    def loss_fn(state):
        m = nnx.merge(graphdef, state)
        with ff.flags.strict_quantization(False):
            pred = m(x)
        return jnp.mean((pred - y) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state)
    updates, opt_state = opt.update(grads, opt_state)
    return loss, jax.tree.map(lambda p, u: p + u, state, updates), opt_state


loss0, state, opt_state = train_step(state, opt_state)
loss1, state, opt_state = train_step(state, opt_state)
assert float(loss1) < float(loss0), (float(loss0), float(loss1))
print(f"QAT loss: {float(loss0):.4f} -> {float(loss1):.4f}")
nnx.update(model, state)

# %% [markdown]
# ## 5. Save / load

# %%
with tempfile.TemporaryDirectory() as tmp:
    path = os.path.join(tmp, "quant")
    from fastforward_tpu.utils.checkpoint import (
        load_quantization_state,
        save_quantization_state,
    )

    save_quantization_state(model, path)

    fresh = Net(nnx.Rngs(0))
    ffnn.quantize_model(fresh)
    config.initialize(fresh)
    load_quantization_state(fresh, path)
    with ff.flags.strict_quantization(False):
        a = np.asarray(model(x))
        b = np.asarray(fresh(x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
print("checkpoint round-trip OK")

# %% [markdown]
# ## 6. GPTQ
#
# Layerwise error-compensated weight quantization on calibration data.

# %%
from fastforward_tpu.algorithms import gptq, layerwise_optimize

gptq_model = Net(nnx.Rngs(0))
ffnn.quantize_model(gptq_model)
calib = [jnp.asarray(np.random.RandomState(i).randn(16, 16), jnp.float32)
         for i in range(3)]
with ff.flags.strict_quantization(False):
    optimized = layerwise_optimize(
        gptq_model, calib, gptq, num_bits=4,
        granularity=ff.PerChannel(1), sequential=True,
    )
assert optimized == ["fc1", "fc2"], optimized
fp_model = Net(nnx.Rngs(0))
with ff.flags.strict_quantization(False):
    sg = float(ff.sqnr(fp_model(x), gptq_model(x)))
print(f"W4 GPTQ output SQNR vs fp32: {sg:.1f} dB")
assert sg > 10, sg
print("quantizing_networks tutorial OK")
