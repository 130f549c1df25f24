"""Fused QKV/gate-up layer must match the unfused stacked forward."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    fuse_stacked_layers,
    random_stacked_params,
    serving_forward_stacked,
)


@pytest.mark.parametrize("mode", ["w8a8", "w4a8"])
def test_fused_matches_unfused(mode):
    config = LlamaConfig.tiny()
    params, stacked = random_stacked_params(config, mode=mode, seed=0)
    fused = fuse_stacked_layers(stacked)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 6)))

    def run(layers):
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=2, max_len=16,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        logits, _ = serving_forward_stacked(params, layers, config, ids, cache=cache)
        return np.asarray(logits)

    ref = run(stacked)
    out = run(fused)
    # identical math modulo bf16 rounding (fused matmul accumulates the same
    # per-column dot products)
    np.testing.assert_allclose(out, ref, atol=0.15)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95
