# %% [markdown]
# # mpath — module path queries
#
# Executable form of `docs/mpath.md` (parity with the reference's
# `docs/examples/mpath.nb.py`; runs in the suite under `--include-slow`).
# mpath is the addressing language for quantizer placement: queries select
# modules or quantizer slots, collections support set algebra and batch
# updates.

# %%
import os

import jax

if os.environ.get("FF_TUTORIAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import mpath, nn as ffnn


# %% [markdown]
# ## A model to query


# %%
class Block(nnx.Module):
    def __init__(self, *, rngs):
        self.linear = nnx.Linear(8, 8, rngs=rngs)
        self.norm = nnx.LayerNorm(8, rngs=rngs)

    def __call__(self, x):
        return self.norm(self.linear(x))


class Model(nnx.Module):
    def __init__(self, *, rngs):
        self.embed = nnx.Embed(16, 8, rngs=rngs)
        self.blocks = nnx.data([Block(rngs=rngs) for _ in range(3)])
        self.head = nnx.Linear(8, 16, rngs=rngs)

    def __call__(self, ids):
        x = self.embed(ids)
        for b in self.blocks:
            x = b(x)
        return self.head(x)


model = Model(rngs=nnx.Rngs(0))

# %% [markdown]
# ## Fragments
#
# `name` literal, `*` one segment, `**` any number (including zero),
# `[cls:...]` isinstance, `[re:...]` regex on the segment name.

# %%
assert mpath.search("head", model).paths == ["head"]
assert len(mpath.search("blocks/*/linear", model)) == 3
assert len(mpath.search("**/[cls:Linear]", model)) == 4  # 3 blocks + head
assert mpath.search("**/head", model).paths == ["head"]  # ** matches zero
assert len(mpath.search("blocks/[re:[01]]/linear", model)) == 2
assert len(
    mpath.search("**/[cls:Block]/norm", model, context={"Block": Block})
) == 3

# %% [markdown]
# ## Selector algebra and collection set ops

# %%
sel = mpath.query("blocks") / "*" / "linear"
linears = mpath.search(sel, model)
head = mpath.search("head", model)
both = mpath.search(sel | "head", model)
assert len(both) == len(linears) + len(head)

all_linear = mpath.search("**/[cls:Linear]", model)
rest = all_linear - linears
assert rest.paths == ["head"]

# %% [markdown]
# ## Quantizer tags
#
# After conversion every slot is a tagged `QuantizerStub`;
# `[quantizer:tag]` fragments select by tag and `ff.find_quantizers`
# returns a collection with `.initialize(factory, **kwargs)`.

# %%
ffnn.quantize_model(model)
weights = ff.find_quantizers(model, "**/[quantizer:parameter/weight]")
acts = ff.find_quantizers(model, "**/[quantizer:activation]")
print(f"{len(weights)} weight slots, {len(acts)} activation slots")
assert len(weights) >= 4

weights.initialize(ffnn.LinearQuantizer, num_bits=4, symmetric=True,
                   granularity=ff.PerChannel(1))
acts.initialize(ffnn.LinearQuantizer, num_bits=8, symmetric=False)

# %% [markdown]
# ## Last-wins precedence via QuantizationConfig
#
# Rules apply in order; the narrower later rule overwrites the broad one.

# %%
config = ff.QuantizationConfig()
config.add_rule("**/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                num_bits=8, symmetric=True)
config.add_rule("head/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
                num_bits=4, symmetric=True)
config.initialize(model)

head_w = ff.find_quantizers(model, "head/[quantizer:parameter/weight]")
block_w = ff.find_quantizers(
    model, "blocks/0/linear/[quantizer:parameter/weight]"
)
assert head_w[0].module.num_bits == 4
assert block_w[0].module.num_bits == 8

# %% [markdown]
# ## Calibrate and run — placement end to end

# %%
ids = jnp.asarray(np.random.RandomState(0).randint(0, 16, (4, 6)))
with ff.flags.strict_quantization(False):
    with ff.estimate_ranges(model, ff.range_setting.running_minmax):
        model(ids)
    out = model(ids)
    out = out.dequantize() if isinstance(out, ff.QuantizedArray) else out
assert np.isfinite(np.asarray(out)).all()
print("mpath tutorial OK")
