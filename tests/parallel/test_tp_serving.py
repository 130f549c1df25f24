"""shard_map TP serving tests (virtual 8-device CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.parallel import make_mesh
from fastforward_tpu.parallel.tp_serving import make_tp_decode_step, shard_for_tp
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    random_stacked_params,
    serving_forward_stacked,
)

pytestmark = pytest.mark.multi_device


@pytest.fixture(scope="module")
def config():
    return LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=16, max_seq_len=64,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("mode", ["w8a8", "w4a8", "w4a8_2l"])
def test_tp_shard_map_matches_single_device(config, mode):
    params, stacked = random_stacked_params(config, mode=mode, seed=0, group_size=32)
    mesh = make_mesh({"data": 2, "model": 4})
    batch = 2

    def fresh_cache():
        return StackedKVCache.create(
            num_layers=config.num_layers, batch_size=batch, max_len=16,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )

    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (batch, 1)))
    positions = jnp.asarray([[0], [0]])

    # single-device reference
    ref_logits, ref_cache = serving_forward_stacked(
        params, stacked, config, tokens, cache=fresh_cache(),
        positions=jnp.asarray([0]),
    )

    cache = fresh_cache()
    p, s, c = shard_for_tp(params, stacked, cache, mesh)
    step = make_tp_decode_step(config, mesh, stacked, params, cache)
    logits, new_cache = step(p, s, c, tokens, jnp.asarray([0]))

    # Per-shard dynamic activation quantization uses local amax (a finer
    # grid than the single-device global amax), so results are close but not
    # bit-identical.
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=0.25
    )
    agree = (
        np.asarray(logits).argmax(-1) == np.asarray(ref_logits).argmax(-1)
    ).mean()
    assert agree > 0.9
    # cache content written in the right (head-sharded) places; values track
    # the reference within activation-quantization noise
    np.testing.assert_allclose(
        np.asarray(new_cache.k[:, :, :, 0], dtype=np.float32),
        np.asarray(ref_cache.k[:, :, :, 0], dtype=np.float32),
        atol=8,
    )
    assert np.abs(np.asarray(new_cache.k[:, :, :, 0], np.int32)).sum() > 0


def test_tp_rejects_indivisible_heads(config):
    import dataclasses

    params, stacked = random_stacked_params(config, mode="w8a8", seed=0)
    mesh = make_mesh({"data": 1, "model": 8})
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=1, max_len=8,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim, quantized=True,
    )
    with pytest.raises(ValueError, match="num_kv_heads"):
        make_tp_decode_step(config, mesh, stacked, params, cache)