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


def test_fused_ogu_decode_matches_unfused(monkeypatch):
    """The large-batch split fusion (o+norm+requant+gateup in one call) must
    match the unfused decode path — CPU exercises the XLA oracle the kernel
    is held to (kernels/matmul.py:fused_o_gu_reference)."""
    # big enough for the paired two-level layout (>= 2 groups of 128)
    # square attention (nh * d == hidden), >= 2 groups of 128 for the
    # paired two-level layout, GQA groups >= 2
    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=128, max_seq_len=64,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    fused = fuse_stacked_layers(stacked)
    assert fused.o_proj.paired
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, 256, (3, 6)))

    def run(flag):
        import fastforward_tpu.serving.stacked as stacked_mod

        monkeypatch.setenv("FF_FUSED_OGU", flag)
        # disable the small-batch full-tail fusion so the ogu branch is the
        # one under test, and force the stacked flow + the serving-on-TPU
        # gate so layer_body takes its kernel branches on CPU (each kernel
        # then runs its XLA reference oracle)
        monkeypatch.setenv("FF_FUSED_LAYER", "0")
        monkeypatch.setenv("FF_KV_STACKED", "force")
        monkeypatch.setattr(stacked_mod, "_serving_on_tpu", lambda: True)
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=3, max_len=16,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        logits, cache = serving_forward_stacked(
            params, fused, config, prompt, cache=cache
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        outs = []
        for _ in range(3):
            logits, cache = serving_forward_stacked(
                params, fused, config, tok, cache=cache
            )
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            outs.append(np.asarray(logits))
        return np.stack(outs)

    off = run("0")
    on = run("1")
    # the fused path computes silu(gate)*up in f32 from the bf16-staged gu
    # where the unfused path stages gated through bf16 — small elementwise
    # drift, identical greedy tokens
    np.testing.assert_allclose(on, off, atol=0.35)
    agree = (on.argmax(-1) == off.argmax(-1)).mean()
    assert agree == 1.0, agree
