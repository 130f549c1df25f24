"""Layer-stacked serving forward: `lax.scan` over the layer dimension.

All decoder layers share one shape, so their frozen weights stack into a
single pytree with a leading L axis and the whole depth runs as one scanned
layer body. Compile time becomes O(1) in depth — required to stage 32-80
layer models quickly — and XLA double-buffers the per-layer weight fetches
through the scan.
"""

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu import flags

from fastforward_tpu.kernels.matmul import _on_tpu as _serving_on_tpu
from fastforward_tpu.models.llama import LlamaConfig, apply_rope, rope_frequencies
from fastforward_tpu.serving.engine import (
    ServingParams,
    _attention_grouped,
    _rms_norm,
)
from fastforward_tpu.serving.kv_cache import NEG_INF, _quantize_kv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedKVCache:
    """Whole-model KV cache as stacked arrays (L, B, n_kv, S, D)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]  # (L, B, n_kv, S) when int8
    v_scale: Optional[jax.Array]
    length: jax.Array  # scalar int32

    @staticmethod
    def create(num_layers, batch_size, max_len, num_kv_heads, head_dim,
               dtype=jnp.bfloat16, quantized=True):
        shape = (num_layers, batch_size, num_kv_heads, max_len, head_dim)
        if quantized:
            return StackedKVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:4], jnp.float32),
                v_scale=jnp.zeros(shape[:4], jnp.float32),
                length=jnp.zeros((), jnp.int32),
            )
        return StackedKVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            k_scale=None, v_scale=None, length=jnp.zeros((), jnp.int32),
        )

    @property
    def is_quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def stack_serving_layers(params: ServingParams):
    """Stack per-layer weight pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params.layers)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedServingLayer:
    """Decode-optimized layer: QKV fused into one matmul, gate+up into one.

    Weight fusion is a concat along the *output* (N) axis — trivially valid
    for both int8 per-channel and packed-int4 per-group storage because the
    K-axis packing and the scale grids are independent per output column.
    Cuts kernel launches per layer from 7 to 4; the decode step is
    launch-overhead-bound at small batch.
    """

    qkv_proj: "QuantLinearType"
    o_proj: "QuantLinearType"
    gateup_proj: "QuantLinearType"
    down_proj: "QuantLinearType"
    input_norm: jax.Array
    post_norm: jax.Array


def _paired_default(n_groups: int) -> bool:
    return flags.default_paired_layout() and n_groups % 2 == 0


def _concat_ql(qls, axis_name="N"):
    from fastforward_tpu.serving.engine import QuantLinear

    first = qls[0]
    assert all(q.mode == first.mode and q.group_size == first.group_size for q in qls)
    data = jnp.concatenate([q.data for q in qls], axis=-1)
    scale = jnp.concatenate([q.scale for q in qls], axis=-1)
    mult = None
    if first.mult is not None:
        mult = jnp.concatenate([q.mult for q in qls], axis=-1)
    assert all(q.paired == first.paired for q in qls)
    # Fused projections share one input, so their static input scales are
    # the same calibration; keep the most conservative (largest) grid.
    in_scale = None
    if all(q.in_scale is not None for q in qls):
        in_scale = functools.reduce(
            jnp.maximum, [q.in_scale for q in qls]
        )
    return QuantLinear(
        data, scale, mode=first.mode, group_size=first.group_size, mult=mult,
        paired=first.paired, in_scale=in_scale,
    )


def _with_packed_mult(ql):
    """Attach the nibble-packed multiplier form for layer-indexed decode.

    `mult` stays int8 at rest for the prefill dequant path; `mult_packed`
    (8 groups per int32, `pack_mult_nibbles`) is what the decode GEMV
    reads — 8× less multiplier traffic per step, and small enough that XLA
    never re-stages the whole stacked array into scoped memory per layer
    (the int32-at-rest form cost ~2.3 ms/step of copies on 8B)."""
    from fastforward_tpu.kernels.packing import pack_mult_nibbles

    if ql.mult is not None and ql.mult_packed is None:
        ql = dataclasses.replace(ql, mult_packed=pack_mult_nibbles(ql.mult))
    if (
        flags.two_level_preblock()
        and ql.mode == "w4a8_2l"
        and ql.paired
        and ql.data.ndim == 3
    ):
        from fastforward_tpu.kernels.matmul import preblock_stacked

        bn = flags.two_level_block_n()
        if ql.data.shape[2] % bn == 0:
            # (L, K//2, N) -> (L, N//bn, K//2, bn): each decode GEMV grid
            # step's weight panel becomes one contiguous HBM chunk (measured
            # 7.22 -> 6.91 ms/step on the isolated batch-32 GEMV loop).
            ql = dataclasses.replace(ql, data=preblock_stacked(ql.data, bn))
    return ql


def fuse_stacked_layers(stacked) -> FusedServingLayer:
    """Fuse a stacked ServingLayer pytree into a FusedServingLayer."""
    return FusedServingLayer(
        qkv_proj=_with_packed_mult(
            _concat_ql([stacked.q_proj, stacked.k_proj, stacked.v_proj])
        ),
        o_proj=_with_packed_mult(stacked.o_proj),
        gateup_proj=_with_packed_mult(
            _concat_ql([stacked.gate_proj, stacked.up_proj])
        ),
        down_proj=_with_packed_mult(stacked.down_proj),
        input_norm=stacked.input_norm,
        post_norm=stacked.post_norm,
    )


def unfuse_stacked_layers(fused: FusedServingLayer,
                          config: LlamaConfig) -> "ServingLayer":
    """Inverse of `fuse_stacked_layers`: split the concatenated qkv and
    gate/up projections back into per-projection `QuantLinear`s.

    N-column slicing is exact for every at-rest layout (packed nibbles,
    scales, and multipliers are all column-independent). Needed by the TP
    path: Megatron column-parallel sharding must split q/k/v and gate/up
    *separately* (a plain N-shard of the concatenated qkv would scatter q
    columns across k/v shards), so `shard_for_tp`/`make_tp_decode_step`
    auto-unfuse (`parallel/tp_serving.py`).
    """
    import dataclasses as _dc

    from fastforward_tpu.serving.engine import ServingLayer

    nh, nkv, d = config.num_heads, config.num_kv_heads, config.head_dim
    inter = config.intermediate_size

    def split(ql, sizes):
        outs, n0 = [], 0
        for n in sizes:
            sl = lambda a: None if a is None else a[..., n0:n0 + n]
            outs.append(_dc.replace(
                ql, data=sl(ql.data), scale=sl(ql.scale),
                mult=sl(ql.mult), mult_packed=None,
                in_scale=ql.in_scale,
            ))
            n0 += n
        return outs

    q, k, v = split(fused.qkv_proj, [nh * d, nkv * d, nkv * d])
    gate, up = split(fused.gateup_proj, [inter, inter])
    strip = lambda ql: _dc.replace(ql, mult_packed=None)
    return ServingLayer(
        q_proj=q, k_proj=k, v_proj=v, o_proj=strip(fused.o_proj),
        gate_proj=gate, up_proj=up, down_proj=strip(fused.down_proj),
        input_norm=fused.input_norm, post_norm=fused.post_norm,
    )


def random_stacked_params(config: LlamaConfig, mode: str = "w4a8",
                          group_size: int = 128, seed: int = 0):
    """Random (params, stacked_layers) with layer weights generated directly
    in stacked form — never materializes per-layer copies, so an 8B model
    stages within one chip's HBM."""
    from fastforward_tpu.kernels import pack_int4
    from fastforward_tpu.serving.engine import QuantLinear, ServingLayer

    h, inter = config.hidden_size, config.intermediate_size
    nh, nkv, d = config.num_heads, config.num_kv_heads, config.head_dim
    L = config.num_layers
    key = jax.random.PRNGKey(seed)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
    def _pack_rand(key, L, K, N, g):
        q = jax.random.randint(key, (L * K, N), -8, 8, dtype=jnp.int8)
        return pack_int4(q, group_size=g).reshape(L, K // 2, N)

    def ql(key, K, N):
        if mode == "w8a8":
            data = jax.random.randint(key, (L, K, N), -127, 128, dtype=jnp.int8)
            scale = jnp.full((L, N), 0.02 / np.sqrt(K), jnp.float32)
            return QuantLinear(data, scale, mode="w8a8")
        if mode in ("sim_w8", "sim_w4"):
            data = jax.random.normal(key, (L, K, N), jnp.bfloat16) / np.sqrt(K)
            if mode == "sim_w8":
                scale = jnp.full((L, N), 0.02 / np.sqrt(K), jnp.float32)
            else:
                g = group_size if K % group_size == 0 else K
                scale = jnp.full((L, K // g, N), 0.25 / np.sqrt(K), jnp.float32)
                return QuantLinear(data, scale, mode=mode, group_size=g)
            return QuantLinear(data, scale, mode=mode)
        g = group_size if K % group_size == 0 else K
        packed = _pack_rand(key, L, K, N, g)
        if mode in ("w4a8_2l", "w4a4_2l"):
            k1, k2 = jax.random.split(key)
            mult = jax.random.randint(k2, (L, K // g, N), 1, 16, dtype=jnp.int8)
            s_col = jnp.full((L, N), 0.25 / np.sqrt(K) / 8.0, jnp.float32)
            return QuantLinear(
                packed, s_col, mode=mode, group_size=g, mult=mult,
                paired=_paired_default(K // g) if mode == "w4a8_2l" else False,
            )
        scale = jnp.full((L, K // g, N), 0.25 / np.sqrt(K), jnp.float32)
        return QuantLinear(packed, scale, mode=mode, group_size=g)

    key, *ks = jax.random.split(key, 10)
    stacked = ServingLayer(
        q_proj=ql(ks[0], h, nh * d),
        k_proj=ql(ks[1], h, nkv * d),
        v_proj=ql(ks[2], h, nkv * d),
        o_proj=ql(ks[3], nh * d, h),
        gate_proj=ql(ks[4], h, inter),
        up_proj=ql(ks[5], h, inter),
        down_proj=ql(ks[6], inter, h),
        input_norm=jnp.ones((L, h), jnp.bfloat16),
        post_norm=jnp.ones((L, h), jnp.bfloat16),
    )

    def head_ql(key, K, N):
        if mode == "w8a8":
            data = jax.random.randint(key, (K, N), -127, 128, dtype=jnp.int8)
            return QuantLinear(data, jnp.full((N,), 0.02 / np.sqrt(K), jnp.float32), mode="w8a8")
        if mode in ("sim_w8", "sim_w4"):
            data = jax.random.normal(key, (K, N), jnp.bfloat16) / np.sqrt(K)
            if mode == "sim_w8":
                return QuantLinear(data, jnp.full((N,), 0.02 / np.sqrt(K), jnp.float32), mode=mode)
            g = group_size if K % group_size == 0 else K
            return QuantLinear(
                data, jnp.full((K // g, N), 0.25 / np.sqrt(K), jnp.float32),
                mode=mode, group_size=g,
            )
        g = group_size if K % group_size == 0 else K
        q = jax.random.randint(key, (K, N), -8, 8, dtype=jnp.int8)
        packed = pack_int4(q, group_size=g)
        if mode in ("w4a8_2l", "w4a4_2l"):
            # A4 mode: the logits head stays w4a8_2l (see freeze_llama).
            k1, k2 = jax.random.split(key)
            mult = jax.random.randint(k2, (K // g, N), 1, 16, dtype=jnp.int8)
            s_col = jnp.full((N,), 0.25 / np.sqrt(K) / 8.0, jnp.float32)
            return QuantLinear(
                packed, s_col, mode="w4a8_2l", group_size=g, mult=mult,
                paired=_paired_default(K // g),
            )
        return QuantLinear(
            packed,
            jnp.full((K // g, N), 0.25 / np.sqrt(K), jnp.float32),
            mode=mode, group_size=g,
        )

    params = ServingParams(
        embedding=jax.random.normal(ks[7], (config.vocab_size, h), jnp.bfloat16) * 0.02,
        layers=(),  # stacked form only
        final_norm=jnp.ones((h,), jnp.bfloat16),
        lm_head=None if config.tie_embeddings else head_ql(ks[8], h, config.vocab_size),
    )
    return params, stacked


def flash_decode_select(
    q3: jax.Array,
    kc: jax.Array,
    ks: jax.Array,
    vc: jax.Array,
    vs: jax.Array,
    lengths: jax.Array,
    layer: jax.Array,
):
    """ONE flash-decode dispatch for every serving path (VERDICT r3 weak
    item 4: the stacked and GSPMD forwards drifted — stacked had
    ragged/bucketed, the engine did not).

    q3 (B, nh, d); kc/vc stacked (L, B, Hkv, S, d) int8 with scales
    (L, B, Hkv, S) — a per-layer (B, Hkv, S, d) cache (the GSPMD
    engine/loader path) is lifted with [None] and layer=0, so both paths
    share the kernels AND the regime selection:

      - ragged per-sequence dynamic-trip pipeline when S >= 1024
        (O(true length) reads; FF_FLASH_RAGGED),
      - bucketed static block-prefix grid for 512 <= S < 1024
        (FF_FLASH_BUCKETED; lax.switch over nb = 1..S/256),
      - whole-S pipelined kernel otherwise.
    """
    from fastforward_tpu.kernels.attention import (
        flash_decode_int8_stacked,
        flash_decode_int8_stacked_ragged,
    )

    if kc.ndim == 4:
        kc, ks, vc, vs = kc[None], ks[None], vc[None], vs[None]
        layer = jnp.zeros((), jnp.int32)
    S_slab = kc.shape[3]
    _ragged_mode = flags.flash_ragged_mode()
    # auto: the cross-sequence-pipelined ragged kernel (FF_RAGGED_XSEQ)
    # wins from S=512 up (interleaved A/B at batch 192: bucketed
    # {8167, 8306} vs ragged-xseq {8410, 8270} tok/s); without xseq the
    # per-sequence pipeline only wins at S >= 1024 (r3).
    _ragged_auto_min = 512 if flags.flash_ragged_xseq() else 1024
    if S_slab % 256 == 0 and (
        _ragged_mode == "1"
        or (_ragged_mode == "auto" and S_slab >= _ragged_auto_min)
    ):
        return flash_decode_int8_stacked_ragged(
            q3, kc, ks, vc, vs, lengths=lengths, layer=layer,
        )
    _bucket_mode = flags.flash_bucketed_mode()
    n_total = S_slab // 256 if S_slab % 256 == 0 else 0
    bucketed = _bucket_mode == "1" or (
        _bucket_mode == "auto" and 512 <= S_slab < 1024
    )
    if bucketed and 2 <= n_total <= 4:
        # O(live) reads at small slabs: pick the smallest static
        # block-prefix grid covering the batch's max live length
        # (kernels/attention.py s_blocks).
        max_live = jnp.max(lengths)
        idx = jnp.clip((max_live + 255) // 256 - 1, 0, n_total - 1)

        def _mk(nb):
            def branch(qq, kk, kks, vv, vvs, ln, ll):
                return flash_decode_int8_stacked(
                    qq, kk, kks, vv, vvs, lengths=ln, layer=ll, s_blocks=nb,
                )
            return branch

        return jax.lax.switch(
            idx, [_mk(nb) for nb in range(1, n_total + 1)],
            q3, kc, ks, vc, vs, lengths, layer,
        )
    return flash_decode_int8_stacked(
        q3, kc, ks, vc, vs, lengths=lengths, layer=layer,
    )


def serving_forward_stacked(
    params: ServingParams,
    stacked_layers,
    config: LlamaConfig,
    input_ids: jax.Array,
    cache: Optional[StackedKVCache] = None,
    positions: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    greedy_head: bool = False,
    logits_positions: str = "all",
):
    """Forward with `lax.scan` over layers. Returns (logits, new_cache).

    ``logits_positions``: "all" (default) or "last" — serving prefill only
    needs the final position's next-token logits; "last" slices the hidden
    state before the lm_head so the (B, T, 128k-vocab) fp32 logits tensor
    is never materialized (at batch 96 × 128-token prompts that tensor
    alone is 6.3 GB — the difference between fitting and OOM on one chip).

    ``tp_axis``: when running inside `shard_map` with Megatron-style TP
    (q/k/v/gate/up column-parallel, o/down row-parallel), the name of the
    model axis — the row-parallel partial sums are `psum`'d over it.

    ``greedy_head``: decode-only fast path — instead of materializing the
    (B, T, vocab) fp32 logits and argmax-ing in XLA, run the fused
    GEMV+argmax Pallas kernel (`matmul_w4a8_2l_gemv_argmax`): the 128k-vocab
    logits never leave VMEM. Returns (token_ids (B,) int32, new_cache).
    Bit-identical token choice to `jnp.argmax(logits[:, -1])` (same fp32
    epilogue, first-occurrence ties). Requires T == 1 and a two-level
    W4A8 `lm_head`; other configurations fall back to logits + argmax.
    """
    B, T = input_ids.shape
    nh, nkv, d = config.num_heads, config.num_kv_heads, config.head_dim
    inv_freq = rope_frequencies(config)
    eps = config.rms_norm_eps

    if positions is None:
        positions = jnp.arange(T)
        if cache is not None:
            positions = positions + cache.length

    x = params.embedding[input_ids]

    if cache is not None:
        if positions.ndim == 1:
            starts = jnp.broadcast_to(positions[0], (B,))
        else:
            starts = positions[:, 0]
        s_idx = jnp.arange(cache.max_len)
        pos2 = positions if positions.ndim == 2 else positions[None, :]
        mask = jnp.where(
            s_idx[None, None, None, :] <= pos2[:, None, :, None], 0.0, NEG_INF
        ).astype(jnp.float32)
    else:
        s = jnp.arange(T)
        pos2 = positions if positions.ndim == 2 else positions[None, :]
        causal = s[None, None, None, :] <= pos2[:, None, :, None]
        mask = jnp.where(causal, 0.0, NEG_INF).astype(jnp.float32)

    def split_heads(t, n):
        return t.reshape(B, T, n, d).transpose(0, 2, 1, 3)

    def write(cache_b, new_b, idx):
        return jax.lax.dynamic_update_slice(
            cache_b, new_b.astype(cache_b.dtype), (0, idx, 0)
        )

    def write_scale(cache_b, new_b, idx):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, idx))

    groups = nh // nkv

    kv_write = flags.kv_write_mode()
    # Stacked-KV decode: the full (L, ...) cache rides the layer-scan CARRY
    # and both the append and the flash read are layer-indexed via scalar
    # prefetch — no per-layer slab slice/update-slice and no per-step
    # whole-cache reassembly (the xs/ys slab flow cost ~0.9 ms/step of slab
    # copies + ~0.8 ms/step of full-cache copies on the profiler trace of
    # the 8B batch-8 loop). `FF_KV_STACKED=0` re-selects the slab flow;
    # `FF_KV_STACKED=force` takes this path off-TPU too (reference-oracle
    # fallbacks inside the kernels keep it exact for CPU tests).
    _kv_stacked_env = flags.kv_stacked_mode()
    from fastforward_tpu.serving.paged import PagedKVCache

    paged = isinstance(cache, PagedKVCache)
    if paged and T != 1:
        raise ValueError(
            "PagedKVCache supports decode-shaped (T == 1) forwards; prefill "
            "goes through a contiguous cache + scatter_prefill_to_pages"
        )
    stacked_kv = (
        not paged
        and cache is not None
        and cache.is_quantized
        and T == 1
        and kv_write == "kernel"
        and flags.use_flash_attention()
        and (
            _kv_stacked_env == "force"
            or (_kv_stacked_env == "1" and _serving_on_tpu())
        )
    )
    # Prefill with the cache riding the layer-scan carry: the slab xs/ys
    # alternative makes XLA hold ~1.5x the cache size in scan temporaries
    # (measured 6 GiB at 8B batch 128 — the r3 batch-ceiling OOM). The
    # carry is updated with one in-place dynamic_update_slice block write
    # per layer; uniform-start prompts only (positions.ndim == 1), which
    # covers every prefill producer (bench, engine bucketed/chunked).
    stacked_prefill = (
        not paged
        and cache is not None
        and cache.is_quantized
        and T > 1
        and positions.ndim == 1
        and flags.prefill_stacked()
    )

    def layer_body(x, l, kc, vc, ks, vs):
        # Weights stay in the scan *closure* as loop invariants; only the
        # integer layer index `l` (and, in the slab KV flow, the KV-cache
        # slabs) ride the scan xs. Scanning over the stacked weight arrays
        # themselves makes XLA materialize a dynamic-slice copy of every
        # weight panel before each Pallas call (~5.2 ms/step of pure copies
        # on the 8B decode loop); `QuantLinear.call_layer` routes `l` into
        # the kernels via scalar prefetch instead, so panels are DMA'd
        # straight from the stack.
        layer = stacked_layers

        def norm_at(w):
            return jax.lax.dynamic_index_in_dim(w, l, keepdims=False)

        fused_head = (
            T == 1
            and tp_axis is None
            and isinstance(layer, FusedServingLayer)
            and (
                (layer.qkv_proj.mode == "w4a8_2l" and layer.qkv_proj.paired)
                or layer.qkv_proj.mode == "w4a4_2l"
            )
            and layer.qkv_proj.mult_packed is not None
            and layer.qkv_proj.in_scale is None
            and layer.qkv_proj.data.ndim == 3
            and flags.fused_qkv()
            and _serving_on_tpu()
        )
        if fused_head and layer.qkv_proj.mode == "w4a4_2l":
            # A4 layer head: same one-pallas_call structure with the int4
            # requant + vertical-layout GEMV (kernels/matmul.py
            # fused_norm_qkv_stacked_a4).
            from fastforward_tpu.kernels.matmul import fused_norm_qkv_stacked_a4

            qp = layer.qkv_proj
            qkv = fused_norm_qkv_stacked_a4(
                x[:, 0, :], layer.input_norm, qp.data, qp.mult_packed,
                qp.scale, l, group_size=qp.group_size, eps=eps,
            )[:, None, :]
            q = split_heads(qkv[..., : nh * d], nh)
            k = split_heads(qkv[..., nh * d : (nh + nkv) * d], nkv)
            v = split_heads(qkv[..., (nh + nkv) * d :], nkv)
        elif fused_head:
            # One-pallas_call layer head: input RMSNorm + dynamic int8
            # requant + qkv GEMV (kernels/matmul.py:fused_norm_qkv_stacked)
            # — the norm/quant run at grid step 0 overlapped with the first
            # weight panel's DMA instead of as XLA ops between calls.
            from fastforward_tpu.kernels.matmul import fused_norm_qkv_stacked

            qp = layer.qkv_proj
            qkv = fused_norm_qkv_stacked(
                x[:, 0, :], layer.input_norm, qp.data, qp.mult_packed,
                qp.scale, l, group_size=qp.group_size, eps=eps,
            )[:, None, :]
            q = split_heads(qkv[..., : nh * d], nh)
            k = split_heads(qkv[..., nh * d : (nh + nkv) * d], nkv)
            v = split_heads(qkv[..., (nh + nkv) * d :], nkv)
        elif isinstance(layer, FusedServingLayer):
            h = _rms_norm(x, norm_at(layer.input_norm), eps)
            qkv = layer.qkv_proj.call_layer(h, l)
            q = split_heads(qkv[..., : nh * d], nh)
            k = split_heads(qkv[..., nh * d : (nh + nkv) * d], nkv)
            v = split_heads(qkv[..., (nh + nkv) * d :], nkv)
        else:
            h = _rms_norm(x, norm_at(layer.input_norm), eps)
            q = split_heads(layer.q_proj.call_layer(h, l), nh)
            k = split_heads(layer.k_proj.call_layer(h, l), nkv)
            v = split_heads(layer.v_proj.call_layer(h, l), nkv)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        use_flash = False
        if kc is not None:
            if paged:
                # Paged pool flow: append through the page table, attend
                # via the paged ragged kernel — O(true length) traffic with
                # one scalar page lookup per block
                # (kernels/paged_attention.py; reference fallbacks keep CPU
                # exact).
                from fastforward_tpu.kernels.paged_attention import (
                    paged_flash_decode_int8,
                    paged_kv_append_decode_int8,
                )

                kq8, ksc = _quantize_kv(k)
                vq8, vsc = _quantize_kv(v)
                kc, vc, ks, vs = paged_kv_append_decode_int8(
                    kc, vc, ks, vs, kq8, vq8,
                    ksc[..., :1], vsc[..., :1], starts, cache.table, l,
                )
                attn = paged_flash_decode_int8(
                    q[:, :, 0, :], kc, ks, vc, vs, cache.table,
                    lengths=starts + 1, layer=l,
                )[:, :, None, :]
                use_flash = True
            elif stacked_kv:
                from fastforward_tpu.kernels.attention import (
                    flash_decode_int8_stacked,
                )
                from fastforward_tpu.kernels.kv_update import (
                    kv_append_decode_int8_stacked,
                )

                kq8, ksc = _quantize_kv(k)
                vq8, vsc = _quantize_kv(v)
                kc, vc, ks, vs = kv_append_decode_int8_stacked(
                    kc, vc, ks, vs, kq8, vq8,
                    ksc[..., :1], vsc[..., :1], starts, l,
                )
                attn = flash_decode_select(
                    q[:, :, 0, :], kc, ks, vc, vs,
                    lengths=starts + 1, layer=l,
                )[:, :, None, :]
                use_flash = True
            elif stacked_prefill:
                # Carry-resident prefill append: quantize this layer's new
                # KV and write it as ONE contiguous block into the stacked
                # (L, B, Hkv, S, d) carry at (l, :, :, start, :). XLA keeps
                # the carry buffer in place across the layer scan, so peak
                # memory is the cache itself — not cache + xs + ys.
                kq8, ksc = _quantize_kv(k)
                vq8, vsc = _quantize_kv(v)
                start0 = starts[0]
                z = jnp.zeros((), start0.dtype)
                kc = jax.lax.dynamic_update_slice(
                    kc, kq8[None].astype(kc.dtype), (l, z, z, start0, z))
                vc = jax.lax.dynamic_update_slice(
                    vc, vq8[None].astype(vc.dtype), (l, z, z, start0, z))
                ks = jax.lax.dynamic_update_slice(
                    ks, ksc[None].astype(ks.dtype), (l, z, z, start0))
                vs = jax.lax.dynamic_update_slice(
                    vs, vsc[None].astype(vs.dtype), (l, z, z, start0))
                kc_l = jax.lax.dynamic_index_in_dim(kc, l, keepdims=False)
                vc_l = jax.lax.dynamic_index_in_dim(vc, l, keepdims=False)
                ks_l = jax.lax.dynamic_index_in_dim(ks, l, keepdims=False)
                vs_l = jax.lax.dynamic_index_in_dim(vs, l, keepdims=False)
                from fastforward_tpu.kernels.matmul import _on_tpu

                if (
                    _on_tpu() and flags.use_flash_prefill()
                    and d % 128 == 0
                ):
                    from fastforward_tpu.kernels.attention import (
                        flash_prefill,
                    )

                    attn = flash_prefill(q, kc_l, ks_l, vc_l, vs_l, starts)
                    use_flash = True
                else:
                    k_all = (
                        kc_l.astype(jnp.float32) * ks_l[..., None]
                    ).astype(x.dtype)
                    v_all = (
                        vc_l.astype(jnp.float32) * vs_l[..., None]
                    ).astype(x.dtype)
            elif kc.dtype == jnp.int8:
                kq8, ksc = _quantize_kv(k)
                vq8, vsc = _quantize_kv(v)
                if T == 1 and kv_write == "kernel":
                    # Pallas in-place append: only the tile-aligned block
                    # holding the write position moves through VMEM
                    # (kernels/kv_update.py); the masked-select and scatter
                    # formulations below re-touch O(S) cache per layer-step.
                    from fastforward_tpu.kernels.kv_update import (
                        kv_append_decode_int8,
                    )

                    kc, vc, ks, vs = kv_append_decode_int8(
                        kc, vc, ks, vs, kq8, vq8,
                        ksc[..., :1], vsc[..., :1], starts,
                    )
                elif T == 1 and kv_write == "mask":
                    # Decode-step append as a masked select over the S axis.
                    # The vmap-of-dynamic_update_slice formulation lowers to
                    # an XLA scatter, which TPU executes as a serialized
                    # per-index loop — measured ~0.5 ms/layer of the batch-32
                    # step. The dense where() is a single fused VPU pass over
                    # the cache (~80 us/layer at batch 32, and XLA aliases
                    # the buffer in-place under scan).
                    sel = (
                        jnp.arange(kc.shape[2])[None, :] == starts[:, None]
                    )  # (B, S)
                    sel4 = sel[:, None, :, None]
                    kc = jnp.where(sel4, kq8.astype(kc.dtype), kc)
                    vc = jnp.where(sel4, vq8.astype(vc.dtype), vc)
                    sel3 = sel[:, None, :]
                    ks = jnp.where(sel3, ksc[..., :1].astype(ks.dtype), ks)
                    vs = jnp.where(sel3, vsc[..., :1].astype(vs.dtype), vs)
                else:
                    kc = jax.vmap(write)(kc, kq8, starts)
                    vc = jax.vmap(write)(vc, vq8, starts)
                    ks = jax.vmap(write_scale)(ks, ksc.astype(ks.dtype), starts)
                    vs = jax.vmap(write_scale)(vs, vsc.astype(vs.dtype), starts)
                from fastforward_tpu.kernels.attention import flash_decode_int8
                from fastforward_tpu.kernels.matmul import _on_tpu

                # FF_BENCH_FLASH=0 forces the XLA dequant-attention path for
                # kernel A/B isolation on the bench.
                use_flash = (
                    T == 1 and groups >= 2 and _on_tpu()
                    and flags.use_flash_attention()
                )
                if use_flash:
                    # Stream the int8 cache through the flash-decode kernel —
                    # no dequantized copy of the cache is ever materialized.
                    attn = flash_decode_int8(
                        q[:, :, 0, :], kc, ks, vc, vs, lengths=starts + 1
                    )[:, :, None, :]
                elif (
                    T > 1 and positions.ndim == 1 and _on_tpu()
                    and flags.use_flash_prefill() and d % 128 == 0
                ):
                    # Blocked flash prefill over the (just-appended) int8
                    # cache: no (T, S) score materialization, no GQA repeat
                    # (kernels/attention.py:flash_prefill). Contiguous
                    # positions only — the auto-generated prefill layout.
                    from fastforward_tpu.kernels.attention import flash_prefill

                    attn = flash_prefill(q, kc, ks, vc, vs, starts)
                    use_flash = True
                else:
                    k_all = (kc.astype(jnp.float32) * ks[..., None]).astype(x.dtype)
                    v_all = (vc.astype(jnp.float32) * vs[..., None]).astype(x.dtype)
            else:
                kc = jax.vmap(write)(kc, k, starts)
                vc = jax.vmap(write)(vc, v, starts)
                from fastforward_tpu.kernels.matmul import _on_tpu

                if (
                    T > 1 and positions.ndim == 1 and _on_tpu()
                    and flags.use_flash_prefill() and d % 128 == 0
                ):
                    from fastforward_tpu.kernels.attention import flash_prefill

                    attn = flash_prefill(
                        q, kc.astype(x.dtype), None, vc.astype(x.dtype), None,
                        starts,
                    )
                    use_flash = True
                else:
                    k_all, v_all = kc.astype(x.dtype), vc.astype(x.dtype)
        else:
            k_all, v_all = k, v

        if not use_flash:
            # GQA without the (groups x) repeated KV copy — shared grouped
            # einsum helper (serving/engine.py:_attention_grouped).
            attn = _attention_grouped(q, k_all, v_all, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nh * d)
        fused_tail = (
            T == 1
            # bm > 64: the fused kernel's activation scratch (gu bf16 is
            # B*2*inter bytes) exceeds the 16 MB scoped-VMEM limit at any
            # bn — large batches take the unfused per-projection calls.
            and B * T <= 64
            and tp_axis is None
            and isinstance(layer, FusedServingLayer)
            and layer.o_proj.mode == "w4a8_2l"
            and layer.o_proj.paired
            and layer.o_proj.mult_packed is not None
            and layer.o_proj.in_scale is None
            # fused_o_mlp_stacked consumes the flat (L, K//2, N) layout
            and layer.o_proj.data.ndim == 3
            and layer.gateup_proj.data.ndim == 3
            and layer.down_proj.data.ndim == 3
            and flags.fused_layer()
            and _serving_on_tpu()
        )
        if fused_tail:
            # One-pallas_call layer tail: o_proj + residual + post-norm +
            # gate/up + SiLU + down + residual — the weight stream never
            # stops at a call boundary (kernels/matmul.py:fused_o_mlp_stacked;
            # per-call serial latency measured in docs/performance.md r2).
            from fastforward_tpu.kernels.matmul import fused_o_mlp_stacked

            o, gu, dn = layer.o_proj, layer.gateup_proj, layer.down_proj
            x = fused_o_mlp_stacked(
                attn[:, 0, :], x[:, 0, :], layer.post_norm,
                o.data, o.mult_packed, o.scale,
                gu.data, gu.mult_packed, gu.scale,
                dn.data, dn.mult_packed, dn.scale,
                l, group_size=o.group_size, eps=eps,
            )[:, None, :]
            return x, kc, vc, ks, vs
        fused_ogu = (
            T == 1
            and not fused_tail
            and B * T <= 256
            and tp_axis is None
            and isinstance(layer, FusedServingLayer)
            and layer.o_proj.mode == "w4a8_2l"
            and layer.o_proj.paired
            and layer.o_proj.mult_packed is not None
            and layer.o_proj.in_scale is None
            and layer.o_proj.data.ndim == 3
            and layer.gateup_proj.data.ndim == 3
            and flags.fused_ogu()
            and _serving_on_tpu()
        )
        if fused_ogu:
            # Large-batch split fusion: o_proj + residual + post-norm +
            # requant + gate/up in one pallas_call (the full tail kernel's
            # gu scratch caps it at bm 64); silu/requant/down finish the
            # layer outside (kernels/matmul.py:fused_o_gu_stacked).
            from fastforward_tpu.kernels.matmul import fused_o_gu_stacked

            o, gup = layer.o_proj, layer.gateup_proj
            x1, gu = fused_o_gu_stacked(
                attn[:, 0, :], x[:, 0, :], layer.post_norm,
                o.data, o.mult_packed, o.scale,
                gup.data, gup.mult_packed, gup.scale,
                l, group_size=o.group_size, eps=eps,
            )
            inter = gu.shape[-1] // 2
            gate = gu[..., :inter].astype(jnp.float32)
            up = gu[..., inter:].astype(jnp.float32)
            gated = (jax.nn.silu(gate) * up).astype(x.dtype)
            mlp_out = layer.down_proj.call_layer(gated[:, None, :], l)
            x = (
                x1[:, None, :] + mlp_out.astype(jnp.float32)
            ).astype(x.dtype)
            return x, kc, vc, ks, vs
        o_out = layer.o_proj.call_layer(attn, l)
        if tp_axis is not None:
            o_out = jax.lax.psum(o_out, tp_axis)
        x = x + o_out

        h = _rms_norm(x, norm_at(layer.post_norm), eps)
        if isinstance(layer, FusedServingLayer):
            gateup = layer.gateup_proj.call_layer(h, l)
            inter = gateup.shape[-1] // 2
            gate, up = gateup[..., :inter], gateup[..., inter:]
            gated = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
            mlp_out = layer.down_proj.call_layer(gated * up, l)
        else:
            gated = jax.nn.silu(
                layer.gate_proj.call_layer(h, l).astype(jnp.float32)
            ).astype(x.dtype)
            mlp_out = layer.down_proj.call_layer(
                gated * layer.up_proj.call_layer(h, l), l
            )
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        x = x + mlp_out
        return x, kc, vc, ks, vs

    num_layers = config.num_layers
    layer_ids = jnp.arange(num_layers, dtype=jnp.int32)
    if cache is not None and (stacked_kv or paged or stacked_prefill):
        def body_stacked(carry, l):
            x, kc, vc, ks, vs = carry
            return layer_body(x, l, kc, vc, ks, vs), ()

        (x, kc, vc, ks, vs), _ = jax.lax.scan(
            body_stacked,
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            layer_ids,
        )
        if paged:
            new_cache = dataclasses.replace(
                cache, k=kc, v=vc, k_scale=ks, v_scale=vs,
                length=cache.length + T,
            )
        else:
            new_cache = StackedKVCache(
                k=kc, v=vc, k_scale=ks, v_scale=vs, length=cache.length + T,
            )
    elif cache is not None:
        def body_slab(x, per_layer):
            l, kc, vc, ks, vs = per_layer
            x, kc, vc, ks, vs = layer_body(x, l, kc, vc, ks, vs)
            return x, (kc, vc, ks, vs)

        xs = (layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale)
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(body_slab, x, xs)
        new_cache = StackedKVCache(
            k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new,
            length=cache.length + T,
        )
    else:
        def body_nocache(x, l):
            x, *_ = layer_body(x, l, None, None, None, None)
            return x, ()

        x, _ = jax.lax.scan(body_nocache, x, layer_ids)
        new_cache = None

    x = _rms_norm(x, params.final_norm, eps)
    if isinstance(logits_positions, str):
        if logits_positions == "last":
            x = x[:, -1:, :]
    else:
        # per-row positions (e.g. bucketed batch prefill with padded rows):
        # gather the hidden state BEFORE the lm_head — same memory win.
        x = jnp.take_along_axis(
            x, jnp.asarray(logits_positions)[:, None, None], axis=1
        )
    lm = params.lm_head
    if greedy_head and T == 1 and lm is not None and lm.mode == "w4a8_2l":
        from fastforward_tpu.kernels.matmul import matmul_w4a8_2l_gemv_argmax
        from fastforward_tpu.serving.engine import quantize_rowwise

        x_q, x_s = quantize_rowwise(x.reshape(B, -1))
        tok = matmul_w4a8_2l_gemv_argmax(
            x_q, x_s, lm.data, lm.mult, lm.scale,
            group_size=lm.group_size, paired=lm.paired,
        )
        return tok, new_cache
    if lm is not None:
        logits = lm(x, out_dtype=jnp.float32)
    else:
        logits = jnp.einsum("bth,vh->btv", x, params.embedding).astype(jnp.float32)
    if greedy_head:
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), new_cache
    return logits, new_cache


def make_stacked_decode_loop(
    config: LlamaConfig,
    num_steps: int,
    donate: bool = True,
    sampling=None,
):
    """Decode loop over the stacked forward; one XLA program.

    Greedy by default. Pass a `serving.sampling.SamplingParams` with
    ``temperature > 0`` for stochastic decoding — the returned loop then
    takes an extra trailing PRNG key argument:
    ``loop(params, stacked_layers, cache, token, key)``.
    """
    from fastforward_tpu.serving.sampling import SamplingParams, sample_logits

    sampling = sampling or SamplingParams(temperature=0.0)

    if sampling.is_greedy:
        # Fused GEMV+argmax head (logits never leave VMEM): bit-identical
        # tokens, measured perf-neutral at batch 8/32 on v5e (the XLA
        # argmax+logits round-trip overlaps with the scanned layer stack),
        # so default off per the no-win knob convention. Verified vs the
        # two-pass oracle on real TPU incl. the ragged 128256 tail.
        fused_argmax = flags.fused_argmax()

        def loop(params, stacked_layers, cache, token):
            def step(carry, _):
                cache, token = carry
                tok, cache = serving_forward_stacked(
                    params, stacked_layers, config, token, cache,
                    greedy_head=fused_argmax,
                )
                if not fused_argmax:
                    tok = jnp.argmax(tok[:, -1], axis=-1)
                nxt = tok.astype(token.dtype)[:, None]
                return (cache, nxt), nxt[:, 0]

            (cache, _), tokens = jax.lax.scan(
                step, (cache, token), None, length=num_steps
            )
            return tokens.T, cache

        return jax.jit(loop, donate_argnums=(2,) if donate else ())

    def loop_sampled(params, stacked_layers, cache, token, key):
        def step(carry, _):
            cache, token, key = carry
            logits, cache = serving_forward_stacked(
                params, stacked_layers, config, token, cache
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

    return jax.jit(loop_sampled, donate_argnums=(2,) if donate else ())
