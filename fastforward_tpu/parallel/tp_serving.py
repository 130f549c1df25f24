"""Tensor-parallel serving via shard_map.

GSPMD cannot partition Pallas kernels, so the W4 execution tier scales with
the explicit-SPMD route: `shard_map` the whole stacked forward over the mesh.
Each device runs the *same* kernels on its local shard (heads and MLP columns
split over the ``model`` axis), and the two row-parallel projections psum
over ICI — the scaling-book recipe, kernel-compatible.

Sharding layout (stacked leaves, leading L axis):
  column-parallel (q/k/v/gate/up): data (L, K, N)→P(None, None, "model"),
  scales shard with N; row-parallel (o/down): data→P(None, "model", None),
  per-group scales (L, K//g, N)→P(None, "model", None).
KV cache: heads over "model", batch over "data". Embedding/norms/lm_head
replicated.
"""

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.engine import QuantLinear, ServingLayer, ServingParams
from fastforward_tpu.serving.stacked import StackedKVCache, serving_forward_stacked


def _ql_spec(ql: QuantLinear, col_parallel: bool) -> QuantLinear:
    mult = None
    if col_parallel:
        data = P(None, None, "model")
        scale = P(None, "model") if ql.scale.ndim == 2 else P(None, None, "model")
        if ql.mult is not None:  # (L, K//g, N): multipliers shard with N
            mult = P(None, None, "model")
    else:
        data = P(None, "model", None)
        scale = P(None) if ql.scale.ndim == 2 else P(None, "model", None)
        if ql.mult is not None:  # row-parallel: groups shard with K
            mult = P(None, "model", None)
    return QuantLinear(
        data, scale, mode=ql.mode, group_size=ql.group_size, mult=mult,
        paired=ql.paired,
    )


def normalize_stacked_for_tp(stacked: ServingLayer, tp: int) -> ServingLayer:
    """Repack row-parallel two-level weights whose local K shard would hold an
    odd group count — the paired nibble layout cannot split mid-pair."""
    from fastforward_tpu.serving.engine import repack_unpaired

    def fix(ql: QuantLinear) -> QuantLinear:
        if ql.mode != "w4a8_2l" or not ql.paired:
            return ql
        n_groups = ql.mult.shape[-2]
        if (n_groups // tp) % 2 != 0 or n_groups % tp != 0:
            return repack_unpaired(ql)
        return ql

    return dataclasses.replace(
        stacked, o_proj=fix(stacked.o_proj), down_proj=fix(stacked.down_proj)
    )


def stacked_layer_specs(stacked: ServingLayer) -> ServingLayer:
    """PartitionSpec tree for (unfused) stacked layers."""
    return ServingLayer(
        q_proj=_ql_spec(stacked.q_proj, True),
        k_proj=_ql_spec(stacked.k_proj, True),
        v_proj=_ql_spec(stacked.v_proj, True),
        o_proj=_ql_spec(stacked.o_proj, False),
        gate_proj=_ql_spec(stacked.gate_proj, True),
        up_proj=_ql_spec(stacked.up_proj, True),
        down_proj=_ql_spec(stacked.down_proj, False),
        input_norm=P(None, None),
        post_norm=P(None, None),
    )


def params_specs(params: ServingParams) -> ServingParams:
    head = None
    if params.lm_head is not None:
        head = QuantLinear(
            P(None, None), P(None) if params.lm_head.scale.ndim == 1 else P(None, None),
            mode=params.lm_head.mode, group_size=params.lm_head.group_size,
            mult=None if params.lm_head.mult is None else P(None, None),
            paired=params.lm_head.paired,
        )
    return ServingParams(
        embedding=P(None, None), layers=(), final_norm=P(None), lm_head=head,
    )


def cache_specs(cache: StackedKVCache, data_axis: str = "data") -> StackedKVCache:
    return StackedKVCache(
        k=P(None, data_axis, "model", None, None),
        v=P(None, data_axis, "model", None, None),
        k_scale=None if cache.k_scale is None else P(None, data_axis, "model", None),
        v_scale=None if cache.v_scale is None else P(None, data_axis, "model", None),
        length=P(),
    )


def paged_cache_specs(cache, data_axis: str = "data"):
    """PartitionSpecs for a `PagedKVCache` pool under TP(+DP).

    Pool (L, P, Hkv, page, d): KV heads shard over "model" (each device
    holds its heads of EVERY page); pages shard over the data axis — each
    data shard runs its own allocator over its local page ids, so a table
    entry is always a local index into the local pool slice (data shards
    are independent engines; a global cross-shard pool would need a
    distributed allocator for no memory win). Tables (B, MP) shard B over
    data and replicate over "model".
    """
    from fastforward_tpu.serving.paged import PagedKVCache

    return PagedKVCache(
        k=P(None, data_axis, "model", None, None),
        v=P(None, data_axis, "model", None, None),
        k_scale=P(None, data_axis, "model", None),
        v_scale=P(None, data_axis, "model", None),
        table=P(data_axis, None),
        length=P(),
    )


def _ensure_unfused(stacked, config=None):
    """TP column-parallel sharding must split q/k/v and gate/up separately —
    a plain N-shard of the concatenated qkv would scatter q columns across
    k/v shards. Auto-unfuse fused decode layers (exact column split)."""
    from fastforward_tpu.serving.stacked import (
        FusedServingLayer,
        unfuse_stacked_layers,
    )

    if not isinstance(stacked, FusedServingLayer):
        return stacked
    if config is None:
        raise ValueError(
            "fused stacked layers need `config` to unfuse for TP; pass "
            "config= or call serving.stacked.unfuse_stacked_layers first"
        )
    return unfuse_stacked_layers(stacked, config)


def shard_for_tp(params: ServingParams, stacked: ServingLayer,
                 cache: StackedKVCache, mesh: Mesh, data_axis: str = "data",
                 config=None):
    """Place params/stacked/cache on the mesh with the TP layout.

    Accepts a `FusedServingLayer` too (pass ``config``): it is unfused
    exactly before sharding — see `_ensure_unfused`."""
    stacked = _ensure_unfused(stacked, config)
    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: x if x is None else jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs, is_leaf=lambda x: x is None,
        )

    from fastforward_tpu.serving.paged import PagedKVCache

    c_specs = (
        paged_cache_specs(cache, data_axis)
        if isinstance(cache, PagedKVCache)
        else cache_specs(cache, data_axis)
    )
    stacked = normalize_stacked_for_tp(stacked, int(mesh.shape["model"]))
    return (
        put(params, params_specs(params)),
        put(stacked, stacked_layer_specs(stacked)),
        put(cache, c_specs),
    )


def make_tp_decode_step(config: LlamaConfig, mesh: Mesh, stacked: ServingLayer,
                        params: ServingParams, cache: StackedKVCache,
                        data_axis: str = "data"):
    """Build the jitted shard_map decode step:
    (params, stacked, cache, tokens, positions) → (logits, cache).

    ``data_axis``: the mesh axis carrying the batch — "data" single-host,
    "dcn" for the multi-host hybrid mesh (`parallel/multihost.py`), where
    weights replicate across hosts and each host decodes its batch shard
    with zero DCN collectives in the step.
    """
    tp = int(mesh.shape["model"])
    if config.num_kv_heads % tp != 0:
        raise ValueError(
            f"num_kv_heads={config.num_kv_heads} must divide over tp={tp}"
        )
    stacked = _ensure_unfused(stacked, config)
    local_config = dataclasses.replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
    )

    from fastforward_tpu.serving.paged import PagedKVCache

    p_specs = params_specs(params)
    s_specs = stacked_layer_specs(normalize_stacked_for_tp(stacked, tp))
    c_specs = (
        paged_cache_specs(cache, data_axis)
        if isinstance(cache, PagedKVCache)
        else cache_specs(cache, data_axis)
    )

    def step(params, stacked, cache, tokens, positions):
        logits, cache = serving_forward_stacked(
            params, stacked, local_config, tokens, cache=cache,
            positions=positions, tp_axis="model",
        )
        return logits, cache

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(p_specs, s_specs, c_specs, P(data_axis, None), P(None)),
        out_specs=(P(data_axis, None, None), c_specs),
        check_rep=False,
    )
    return jax.jit(sharded)


def make_tp_decode_loop(config: LlamaConfig, mesh: Mesh, stacked: ServingLayer,
                        params: ServingParams, cache: StackedKVCache,
                        num_steps: int, data_axis: str = "data",
                        sampling=None, donate: bool = True):
    """Multi-step TP decode loop: the `lax.scan` over decode steps runs
    INSIDE one `shard_map` (VERDICT r4 item 4) — one XLA program per decode
    burst, the config-5 runway. Mirrors the single-chip
    `serving.stacked.make_stacked_decode_loop` (fused-argmax greedy head or
    per-row sampling) with Megatron TP: only the two row-parallel psums per
    layer cross ICI per step; the head runs per data shard.

    Greedy:  loop(params, stacked, cache, token) -> (tokens (B, S), cache)
    Sampled: loop(params, stacked, cache, token, key) -> same

    ``token`` is (B, 1) sharded over ``data_axis``; tokens return sharded
    the same way. Works with both the contiguous slab and the paged pool
    (per-shard local page ids, `paged_cache_specs`).
    """
    import jax.numpy as jnp

    from fastforward_tpu import flags
    from fastforward_tpu.serving.paged import PagedKVCache
    from fastforward_tpu.serving.sampling import SamplingParams, sample_logits

    sampling = sampling or SamplingParams(temperature=0.0)
    tp = int(mesh.shape["model"])
    if config.num_kv_heads % tp != 0:
        raise ValueError(
            f"num_kv_heads={config.num_kv_heads} must divide over tp={tp}"
        )
    stacked = _ensure_unfused(stacked, config)
    local_config = dataclasses.replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
    )

    p_specs = params_specs(params)
    s_specs = stacked_layer_specs(normalize_stacked_for_tp(stacked, tp))
    c_specs = (
        paged_cache_specs(cache, data_axis)
        if isinstance(cache, PagedKVCache)
        else cache_specs(cache, data_axis)
    )

    if sampling.is_greedy:
        fused_argmax = flags.fused_argmax()

        def loop(params, stacked, cache, token):
            def step(carry, _):
                cache, token = carry
                tok, cache = serving_forward_stacked(
                    params, stacked, local_config, token, cache,
                    tp_axis="model", greedy_head=fused_argmax,
                )
                if not fused_argmax:
                    tok = jnp.argmax(tok[:, -1], axis=-1)
                nxt = tok.astype(token.dtype)[:, None]
                return (cache, nxt), nxt[:, 0]

            (cache, _), tokens = jax.lax.scan(
                step, (cache, token), None, length=num_steps
            )
            return tokens.T, cache

        sharded = shard_map(
            loop,
            mesh=mesh,
            in_specs=(p_specs, s_specs, c_specs, P(data_axis, None)),
            out_specs=(P(data_axis, None), c_specs),
            check_rep=False,
        )
        return jax.jit(sharded, donate_argnums=(2,) if donate else ())

    def loop_sampled(params, stacked, cache, token, key):
        # Each data shard draws its own stream (fold in the shard index);
        # model-axis ranks fold identically, so TP replicas agree.
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))

        def step(carry, _):
            cache, token, key = carry
            logits, cache = serving_forward_stacked(
                params, stacked, local_config, token, cache, tp_axis="model"
            )
            key, sub = jax.random.split(key)
            nxt = sample_logits(logits[:, -1], sampling, sub).astype(
                token.dtype
            )[:, None]
            return (cache, nxt, key), nxt[:, 0]

        (cache, _, _), tokens = jax.lax.scan(
            step, (cache, token, key), None, length=num_steps
        )
        return tokens.T, cache

    sharded = shard_map(
        loop_sampled,
        mesh=mesh,
        in_specs=(p_specs, s_specs, c_specs, P(data_axis, None), P()),
        out_specs=(P(data_axis, None), c_specs),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(2,) if donate else ())
