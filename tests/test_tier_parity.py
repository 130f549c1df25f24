"""Tier parity: the execution tier must reproduce the simulation tier's
quantization grid (the BASELINE ≤0.1-ppl-delta criterion, testable without
external datasets because both tiers run the same weights)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import fastforward_tpu as ff
from fastforward_tpu import nn as ffnn
from fastforward_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from fastforward_tpu.serving.engine import freeze_llama, serving_forward, quantize_linear
from fastforward_tpu.utils.evaluation import perplexity_delta


@pytest.fixture(scope="module")
def calibrated():
    """A tiny Llama, sim-tier quantized W4 per-group on linear weights."""
    config = dataclasses.replace(LlamaConfig.tiny(), hidden_size=128,
                                 intermediate_size=256, num_heads=4,
                                 num_kv_heads=2, head_dim=32)
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ffnn.quantize_model(model)
    cfg = ff.QuantizationConfig()
    cfg.add_rule(
        "**/[cls:Linear]/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
        num_bits=4, symmetric=True, allow_one_sided=False,
        granularity=ff.PerBlock(block_dims=0, block_sizes=128, per_channel_dims=1),
    )
    cfg.initialize(model)
    # min-max ranges per group from the actual weights
    from fastforward_tpu.quantization import tiling

    for _, module in nnx.iter_modules(model):
        if isinstance(module, ffnn.QuantizedLinear):
            w = module.kernel.value
            tile = module.weight_quantizer.granularity.tile_size(w.shape)
            tiled = w.reshape(tiling.interleaved_shape(w.shape, tile))
            axes = tuple(range(1, tiled.ndim, 2))
            mn = jnp.min(tiled, axis=axes).reshape(-1)
            mx = jnp.max(tiled, axis=axes).reshape(-1)
            mabs = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
            module.weight_quantizer.quantization_range = (-mabs, mabs)
    return config, model


def test_frozen_scales_match_sim_quantizer(calibrated):
    config, model = calibrated
    params = freeze_llama(model, mode="w4a16", group_size=128)
    # the frozen scale equals the sim-tier quantizer scale exactly
    sim_scale = np.asarray(
        model.layers[0].self_attn.q_proj.weight_quantizer.scale.value
    ).reshape(params.layers[0].q_proj.scale.shape)
    np.testing.assert_allclose(
        np.asarray(params.layers[0].q_proj.scale), sim_scale, rtol=1e-6
    )


def test_exec_tier_ppl_delta_below_threshold(calibrated):
    """Sim-tier (fake-quant weights) vs exec-tier (true int4) perplexity on
    the same token stream: delta must be tiny (same grid, differing only in
    activation handling)."""
    config, model = calibrated
    params = freeze_llama(model, mode="w4a16", group_size=128)

    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randint(0, config.vocab_size, (2, 32)))
               for _ in range(2)]

    def sim_forward(ids):
        with ff.strict_quantization(False):
            logits, _ = model(ids)
        return logits

    def exec_forward(ids):
        logits, _ = serving_forward(params, config, ids)
        return logits

    ppl_sim, ppl_exec, delta = perplexity_delta(sim_forward, exec_forward, batches)
    # Random-weight ppl ~ vocab size; the *relative* delta is the criterion.
    assert delta / ppl_sim < 0.02, (ppl_sim, ppl_exec)


def test_external_scale_roundtrip():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(256, 32).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.05, 0.3, (2, 32)).astype(np.float32))
    ql = quantize_linear(w, "w4a16", group_size=128, scale=scale)
    np.testing.assert_allclose(np.asarray(ql.scale), np.asarray(scale))


def _calibrate_input_quantizers(model, batches):
    """Install per-tensor symmetric 8-bit input quantizers and calibrate
    their ranges with running min-max over the batches."""
    cfg = ff.QuantizationConfig()
    cfg.add_rule(
        "**/[cls:Linear]/[quantizer:activation/input]", ffnn.LinearQuantizer,
        num_bits=8, symmetric=True, allow_one_sided=False,
        granularity=ff.PerTensor(),
    )
    cfg.initialize(model)
    with ff.strict_quantization(False):
        with ff.estimate_ranges(model, ff.range_setting.running_minmax):
            for ids in batches:
                model(ids)


def test_static_a8_parity(calibrated):
    """Static-A8: calibrated sim-tier input quantizer scales carried into
    the frozen engine (`freeze_llama(static_activations=True)`) — exec-tier
    output must track the sim tier within the same class as dynamic-A8
    (VERDICT round-1 item 6)."""
    config, model = calibrated
    rng = np.random.RandomState(3)
    batches = [jnp.asarray(rng.randint(0, config.vocab_size, (2, 32)))
               for _ in range(2)]
    _calibrate_input_quantizers(model, batches)

    params = freeze_llama(model, mode="w4a8", group_size=128,
                          static_activations=True)
    # the lifted static scales exist and equal the sim quantizer's scale
    q0 = model.layers[0].self_attn.q_proj.input_quantizer
    assert params.layers[0].q_proj.in_scale is not None
    np.testing.assert_allclose(
        float(params.layers[0].q_proj.in_scale),
        float(np.asarray(q0.scale.value).reshape(())), rtol=1e-6,
    )

    def sim_forward(ids):
        with ff.strict_quantization(False):
            logits, _ = model(ids)
        return logits

    def exec_forward(ids):
        logits, _ = serving_forward(params, config, ids)
        return logits

    ppl_sim, ppl_exec, delta = perplexity_delta(sim_forward, exec_forward, batches)
    assert delta / ppl_sim < 0.02, (ppl_sim, ppl_exec)

    # dynamic-A8 params for comparison: static must not be materially worse
    params_dyn = freeze_llama(model, mode="w4a8", group_size=128)
    assert params_dyn.layers[0].q_proj.in_scale is None

    def exec_dyn(ids):
        logits, _ = serving_forward(params_dyn, config, ids)
        return logits

    _, _, delta_dyn = perplexity_delta(sim_forward, exec_dyn, batches)
    assert delta <= delta_dyn * 1.5 + 0.02 * ppl_sim, (delta, delta_dyn)


def test_static_a8_stacked_decode_runs(calibrated):
    """Static-A8 flows through the stacked serving path (fused projections
    take the max of the fused inputs' scales; call_layer slices the stacked
    per-layer scale)."""
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        serving_forward_stacked,
        stack_serving_layers,
    )

    config, model = calibrated
    rng = np.random.RandomState(4)
    batches = [jnp.asarray(rng.randint(0, config.vocab_size, (2, 16)))]
    _calibrate_input_quantizers(model, batches)
    params = freeze_llama(model, mode="w4a8_2l", group_size=128,
                          static_activations=True)
    stacked = fuse_stacked_layers(stack_serving_layers(params))
    assert stacked.qkv_proj.in_scale is not None
    assert stacked.qkv_proj.in_scale.shape[0] == config.num_layers
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=2, max_len=32,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    logits, cache = serving_forward_stacked(
        params, stacked, config, batches[0], cache
    )
    assert logits.shape == (2, 16, config.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
