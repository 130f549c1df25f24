"""Mesh/TP sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.parallel import make_mesh, shard_kv_cache, shard_serving_params
from fastforward_tpu.serving import KVCache
from fastforward_tpu.serving.engine import random_serving_params, serving_forward

pytestmark = pytest.mark.multi_device


@pytest.fixture(scope="module")
def config():
    return LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=16, max_seq_len=64,
        dtype=jnp.float32,
    )


def test_make_mesh_infer():
    mesh = make_mesh({"data": 2, "model": -1})
    assert mesh.shape["model"] == jax.device_count() // 2


def test_tp_forward_matches_single_device(config):
    params = random_serving_params(config, mode="w8a8", seed=0)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 8)))
    fwd = jax.jit(lambda p, i: serving_forward(p, config, i)[0])
    expected = fwd(params, ids)

    mesh = make_mesh({"data": 1, "model": 4}, devices=jax.devices()[:4])
    sharded = shard_serving_params(params, mesh)
    out = fwd(sharded, ids)
    # bf16 activations: partitioned execution changes fusion/rounding slightly
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-2, atol=5e-2)


def test_tp_dp_decode_with_sharded_cache(config):
    mesh = make_mesh({"data": 2, "model": 4})
    params = shard_serving_params(random_serving_params(config, mode="w8a8", seed=1), mesh)
    cache = KVCache.create(
        num_layers=config.num_layers, batch_size=4, max_len=16,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    cache = shard_kv_cache(cache, mesh)
    ids = jax.device_put(
        jnp.asarray(np.random.RandomState(1).randint(0, 256, (4, 4))),
        NamedSharding(mesh, P("data", None)),
    )

    @jax.jit
    def step(p, c, i):
        return serving_forward(p, config, i, cache=c)

    logits, cache = step(params, cache, ids)
    assert logits.shape == (4, 4, 256)
    assert int(cache.length) == 4
    # weights are actually distributed over the model axis
    q_sharding = params.layers[0].q_proj.data.sharding
    assert q_sharding.spec == P(None, "model")


def test_sharded_weight_scale_alignment(config):
    """Per-group scales shard with their blocks (SURVEY §7 hard part)."""
    mesh = make_mesh({"data": 1, "model": 4}, devices=jax.devices()[:4])
    # group size must satisfy (K/tp) % g == 0 for row-parallel layers
    params = shard_serving_params(
        random_serving_params(config, mode="w4a16", seed=0, group_size=32), mesh
    )
    with pytest.raises(ValueError, match="row-shard"):
        shard_serving_params(
            random_serving_params(config, mode="w4a16", seed=0, group_size=64), mesh
        )
    layer = params.layers[0]
    # column-parallel: packed data and (K//g, N) scale both shard on N
    assert layer.q_proj.data.sharding.spec == P(None, "model")
    assert layer.q_proj.scale.sharding.spec == P(None, "model")
    # row-parallel: both shard on K (groups divide evenly across shards)
    assert layer.down_proj.data.sharding.spec == P("model", None)
    assert layer.down_proj.scale.sharding.spec == P("model", None)
