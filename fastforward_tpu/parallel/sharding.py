"""Tensor-parallel sharding rules for quantized serving params.

The scaling-book recipe: Megatron-style TP over the ``model`` axis —
column-parallel q/k/v/gate/up (shard the output dim), row-parallel o/down
(shard the input dim; GSPMD inserts the reduce-scatter/all-reduce), KV cache
sharded over heads, batch over ``data``.

Quantization twist (SURVEY §7 hard parts): scale tensors must shard
*consistently with their blocks* — per-out-channel scales shard with N,
per-group (K//g, N) scales shard with whichever of K/N the data shards, and
the packed-int4 K axis (K//2 rows) lines up with K-sharding because the
packing groups (128 rows → 64 packed) never straddle a shard boundary when
shard_size % group_size == 0.
"""


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastforward_tpu.serving.engine import QuantLinear, ServingLayer, ServingParams
from fastforward_tpu.serving.kv_cache import KVCache, LayerKVCache


def _ql_spec(col_parallel: bool) -> dict[str, P]:
    """PartitionSpecs for a QuantLinear's leaves.

    Column-parallel (shard N): data (K, N)→P(None, "model"); w8 scale (N,)→
    P("model"); w4 scale (K//g, N)→P(None, "model").
    Row-parallel (shard K): data→P("model", None); w8 scale replicated; w4
    scale (K//g, N)→P("model", None).
    """
    if col_parallel:
        return {"data": P(None, "model"), "scale_w8": P("model"), "scale_w4": P(None, "model")}
    return {"data": P("model", None), "scale_w8": P(), "scale_w4": P("model", None)}


def _shard_ql(ql: QuantLinear, mesh: Mesh, col_parallel: bool) -> QuantLinear:
    spec = _ql_spec(col_parallel)
    scale_spec = spec["scale_w8"] if ql.scale.ndim == 1 else spec["scale_w4"]
    if not col_parallel and ql.scale.ndim == 2:
        # Row-parallel per-group weights: every shard must hold whole groups
        # (scale rows), i.e. (K / tp) % group_size == 0.
        tp = int(mesh.shape["model"])
        n_groups = ql.scale.shape[0]
        if n_groups % tp != 0:
            raise ValueError(
                f"Cannot row-shard per-group quantized weight: {n_groups} "
                f"groups (group_size={ql.group_size}) do not divide over "
                f"tp={tp} shards. Use a group size g with (K/tp) % g == 0."
            )
    return QuantLinear(
        data=jax.device_put(ql.data, NamedSharding(mesh, spec["data"])),
        scale=jax.device_put(ql.scale, NamedSharding(mesh, scale_spec)),
        mode=ql.mode,
        group_size=ql.group_size,
        paired=ql.paired,
    )


def serving_param_spec(params: ServingParams, mesh: Mesh):
    """The sharding tree (same structure as params) — useful for pjit
    in_shardings and for documentation/tests."""

    def ql_sharding(ql: QuantLinear, col: bool):
        spec = _ql_spec(col)
        scale_spec = spec["scale_w8"] if ql.scale.ndim == 1 else spec["scale_w4"]
        return QuantLinear(
            data=NamedSharding(mesh, spec["data"]),
            scale=NamedSharding(mesh, scale_spec),
            mode=ql.mode, group_size=ql.group_size, paired=ql.paired,
        )

    layers = tuple(
        ServingLayer(
            q_proj=ql_sharding(l.q_proj, True),
            k_proj=ql_sharding(l.k_proj, True),
            v_proj=ql_sharding(l.v_proj, True),
            o_proj=ql_sharding(l.o_proj, False),
            gate_proj=ql_sharding(l.gate_proj, True),
            up_proj=ql_sharding(l.up_proj, True),
            down_proj=ql_sharding(l.down_proj, False),
            input_norm=NamedSharding(mesh, P(None)),
            post_norm=NamedSharding(mesh, P(None)),
        )
        for l in params.layers
    )
    return ServingParams(
        embedding=NamedSharding(mesh, P(None, None)),
        layers=layers,
        final_norm=NamedSharding(mesh, P(None)),
        lm_head=None if params.lm_head is None else ql_sharding(params.lm_head, True),
    )


def shard_serving_params(params: ServingParams, mesh: Mesh) -> ServingParams:
    """Place ServingParams on the mesh with Megatron-style TP shardings."""
    layers = tuple(
        ServingLayer(
            q_proj=_shard_ql(l.q_proj, mesh, True),
            k_proj=_shard_ql(l.k_proj, mesh, True),
            v_proj=_shard_ql(l.v_proj, mesh, True),
            o_proj=_shard_ql(l.o_proj, mesh, False),
            gate_proj=_shard_ql(l.gate_proj, mesh, True),
            up_proj=_shard_ql(l.up_proj, mesh, True),
            down_proj=_shard_ql(l.down_proj, mesh, False),
            input_norm=jax.device_put(l.input_norm, NamedSharding(mesh, P(None))),
            post_norm=jax.device_put(l.post_norm, NamedSharding(mesh, P(None))),
        )
        for l in params.layers
    )
    return ServingParams(
        embedding=jax.device_put(params.embedding, NamedSharding(mesh, P(None, None))),
        layers=layers,
        final_norm=jax.device_put(params.final_norm, NamedSharding(mesh, P(None))),
        lm_head=None
        if params.lm_head is None
        else _shard_ql(params.lm_head, mesh, True),
    )


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over: ("dcn", "data") on a
    hybrid multi-host mesh (`make_hybrid_mesh`) so data parallelism spans
    hosts over DCN while model axes stay inside a host's ICI domain;
    plain "data" on a single-host mesh."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else "data"


def shard_kv_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """Shard the KV cache: batch over the data axes (incl. ``dcn`` on a
    hybrid mesh), kv-heads over ``model``."""
    b = batch_axes(mesh)
    spec4 = NamedSharding(mesh, P(b, "model", None, None))
    spec3 = NamedSharding(mesh, P(b, "model", None))

    def shard_layer(lc: LayerKVCache) -> LayerKVCache:
        return LayerKVCache(
            k=jax.device_put(lc.k, spec4),
            v=jax.device_put(lc.v, spec4),
            k_scale=None if lc.k_scale is None else jax.device_put(lc.k_scale, spec3),
            v_scale=None if lc.v_scale is None else jax.device_put(lc.v_scale, spec3),
        )

    return KVCache(
        layers=tuple(shard_layer(lc) for lc in cache.layers),
        length=jax.device_put(cache.length, NamedSharding(mesh, P())),
    )
