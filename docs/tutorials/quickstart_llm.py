# %% [markdown]
# # Quick start: quantize and serve an LLM
#
# Executable form of `docs/quickstart_llm.md` (the TPU-native analog of the
# reference's `docs/examples/quick_start_quantize_llms.nb.py` — runnable
# tutorials double as integration tests of the public API; this file runs
# in the test suite under `--include-slow`). A tiny Llama config keeps it
# CPU-fast; every step is the same call you'd make at 8B.

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
from fastforward_tpu.models.llama import LlamaConfig, LlamaForCausalLM

# %% [markdown]
# ## 1. Build the model and convert
#
# `quantize_model` swaps every module for its Quantized* counterpart and
# installs `QuantizerStub` slots (pass-through until configured).

# %%
config = LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_seq_len=64,
    dtype=jnp.float32,
)
model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
ffnn.quantize_model(model)

rng = np.random.RandomState(0)
calibration_batches = [
    jnp.asarray(rng.randint(0, config.vocab_size, (2, 16))) for _ in range(2)
]
eval_token_batches = [
    jnp.asarray(rng.randint(0, config.vocab_size, (2, 16))) for _ in range(2)
]

# %% [markdown]
# ## 2. Place quantizers with mpath rules
#
# INT4 per-group (g=16 at this toy width; 128 at 8B) weights, INT8
# activations.

# %%
from fastforward_tpu.nn import LinearQuantizer
from fastforward_tpu.quantization.granularity import PerBlock

cfg = ff.QuantizationConfig()
# Catch-all for 1-D params (norm scales, biases): plain INT8 per-tensor.
cfg.add_rule("**/[quantizer:parameter]", LinearQuantizer,
             num_bits=8, symmetric=True)
# Linear weights: INT4 per-group (the PerBlock rule needs the 2-D (K, N)
# layout, so scope it to Linear modules — a bare parameter/weight query
# would also hit 1-D RMSNorm scales).
cfg.add_rule(
    "**/[cls:Linear]/[quantizer:parameter/weight]", LinearQuantizer,
    num_bits=4, symmetric=True,
    granularity=PerBlock(block_dims=0, block_sizes=16, per_channel_dims=1),
)
cfg.add_rule(
    "**/[quantizer:activation/input]", LinearQuantizer,
    num_bits=8, symmetric=True,
)
cfg.initialize(model)

# %% [markdown]
# ## 3. Calibrate ranges

# %%
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.smoothed_minmax):
        for batch in calibration_batches:
            model(batch)

# %% [markdown]
# ## 4. Evaluate in simulation

# %%
from fastforward_tpu.utils.evaluation import evaluate_perplexity

with ff.flags.strict_quantization(False):
    ppl = evaluate_perplexity(
        lambda ids: model(ids)[0], eval_token_batches
    )
assert float(ppl) > 0
print(f"sim-tier perplexity: {float(ppl):.2f}")

# %% [markdown]
# ## 5. Freeze to the execution tier and serve
#
# `freeze_llama` carries the calibrated scales into true low-bit storage;
# the decode loop compiles to one XLA program (`lax.scan` over steps and
# layers).

# %%
from fastforward_tpu.serving.engine import freeze_llama
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    make_stacked_decode_loop,
    serving_forward_stacked,
    stack_serving_layers,
)

params = freeze_llama(model, mode="w4a8", group_size=16)
stacked = stack_serving_layers(params)
cache = StackedKVCache.create(
    num_layers=config.num_layers, batch_size=2, max_len=64,
    num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
    quantized=True,
)

prompt = jnp.asarray(rng.randint(0, config.vocab_size, (2, 8)))
logits, cache = serving_forward_stacked(
    params, stacked, config, prompt, cache=cache, logits_positions="last"
)
first_token = jnp.argmax(logits[:, -1], axis=-1).astype(prompt.dtype)[:, None]

loop = make_stacked_decode_loop(config, num_steps=4)
tokens, cache = loop(params, stacked, cache, first_token)
assert tokens.shape == (2, 4)
print("generated:", np.asarray(tokens))
print("quickstart tutorial OK")
