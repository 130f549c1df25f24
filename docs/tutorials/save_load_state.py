# %% [markdown]
# # Saving and loading quantization state
#
# Executable form of `docs/save_load_quantization_state.md` (parity with
# the reference's `docs/examples/save_load_quantization_state.nb.py`; runs
# under `--include-slow`). Quantization state — which quantizer sits on
# which slot, its constructor args, and its learned scales/offsets — is a
# small sidecar checkpoint, independent of the base weights.

# %%
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
from fastforward_tpu.utils.checkpoint import (
    load_quantization_state,
    save_quantization_state,
)


# %% [markdown]
# ## A calibrated model to checkpoint
#
# Note the SHARED quantizer: one LinearQuantizer instance serves both
# layers' input slots — sharing must survive the round-trip.


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


def build_and_place():
    model = Net(rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    config = ff.QuantizationConfig()
    config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                    num_bits=4, symmetric=True,
                    granularity=ff.PerChannel(1))
    config.add_rule("**/[quantizer:activation/output]", ffnn.LinearQuantizer,
                    num_bits=8, symmetric=False)
    config.initialize(model)
    return model


model = build_and_place()
shared = ffnn.LinearQuantizer(num_bits=8, symmetric=False)
model.fc1.input_quantizer = shared
model.fc2.input_quantizer = shared

x = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(x)
    q_out = np.asarray(model(x))

# %% [markdown]
# ## Save
#
# Two files: `config.yaml` (quantizer type + ctor args + parameter map,
# shared instances stored once with `shared_with:`) and
# `quantizers.safetensors` (scale/offset tensors).

# %%
tmp = tempfile.mkdtemp()
state_path = os.path.join(tmp, "quant_state")
save_quantization_state(model, state_path)
print(sorted(os.listdir(state_path)))
assert set(os.listdir(state_path)) >= {"config.yaml", "quantizers.safetensors"}
cfg_text = open(os.path.join(state_path, "config.yaml")).read()
assert "shared_with" in cfg_text, "shared quantizer must be deduplicated"

# %% [markdown]
# ## Load onto a fresh model
#
# Fresh weights + stubs, then `load_quantization_state` reconstructs every
# quantizer, restores parameters, and re-links shared instances.

# %%
fresh = build_and_place()
load_quantization_state(fresh, state_path)
with ff.flags.strict_quantization(False):
    out2 = np.asarray(fresh(x))
np.testing.assert_array_equal(out2, q_out)  # bitwise: same scales, same grid
assert fresh.fc1.input_quantizer is fresh.fc2.input_quantizer
print("round-trip bitwise parity + shared instance re-linked")

# %% [markdown]
# ## Overwrite policies
#
# Slots already holding non-stub quantizers: "overwrite" (default)
# replaces, "skip" keeps, "error" raises.

# %%
occupied = build_and_place()
keep = occupied.fc1.weight_quantizer
load_quantization_state(occupied, state_path, overwrite_policy="skip")
assert occupied.fc1.weight_quantizer is keep

try:
    load_quantization_state(occupied, state_path, overwrite_policy="error")
except ff.QuantizationError as e:
    print(f"error policy raised as documented: {type(e).__name__}")
else:
    raise AssertionError("error policy must raise on occupied slots")

# %% [markdown]
# ## Lazy quantizers round-trip as lazy
#
# A placed-but-never-calibrated quantizer has no parameters yet; it saves
# as a `::lazy` marker and re-materializes on the first batch after load.

# %%
lazy_model = build_and_place()  # placed, NOT calibrated
lazy_path = os.path.join(tmp, "lazy_state")
# lazy (uncalibrated) parameters are opt-in on both sides — without the
# flag, save/load raise instead of silently shipping an uncalibrated state
save_quantization_state(lazy_model, lazy_path, allow_lazy_params=True)
lazy_fresh = build_and_place()
load_quantization_state(lazy_fresh, lazy_path, allow_lazy_params=True)
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(lazy_fresh, ff.range_setting.running_minmax):
        lazy_fresh(x)
    out3 = lazy_fresh(x)
assert np.isfinite(np.asarray(out3)).all()
print("lazy state re-materialized on first calibration after load")
print("save_load_state tutorial OK")
