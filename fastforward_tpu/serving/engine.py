"""Execution-tier serving engine for the Llama family.

New TPU capability (SURVEY §2.9: absent in the reference). The simulation
tier (QuantizedModule models) QDQs bf16 weights every call — faithful to the
reference's fake-quant semantics but memory-bound at bf16. This engine
*freezes* a quantized model into true low-bit storage (the analog of
reference `quantization/freeze.py`, done once at load):

  - W8A8: int8 weights, per-out-channel scales; XLA int8 MXU dots with
    dynamic per-token activation quantization.
  - W4A8 / W4A16: packed-int4 per-group (g=128) weights; Pallas fused
    dequant-matmul kernels.
  - INT8 KV cache (per-token-per-head scales), quantized at append.

Everything is a pure function over a params pytree → jit/scan/pjit-friendly;
prefill and the full multi-step decode loop each compile to one XLA program.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu import flags

from fastforward_tpu.kernels import (
    matmul_w4a8,
    matmul_w4a16,
    matmul_w8a8,
    pack_int4,
    quantize_rowwise,
)
from fastforward_tpu.kernels.matmul import (
    _GEMV_MAX_M,
    _on_tpu,
    convert_two_level,
    convert_two_level_a4,
    dequantize_int4,
    dequantize_int4_vertical,
    matmul_w4a4_2l_gemv,
    matmul_w4a4_2l_gemv_stacked,
    matmul_w4a8_2l_gemv,
    matmul_w4a8_2l_gemv_stacked,
    quantize_rowwise_a4,
)
from fastforward_tpu.models.llama import LlamaConfig, apply_rope, rope_frequencies
from fastforward_tpu.serving.kv_cache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    """Frozen quantized linear weights (layout (in, out))."""

    data: jax.Array  # int8 (K, N) for w8; packed int8 (K//2, N) for w4
    scale: jax.Array  # (N,) for w8 and w4a8_2l (per-column); (K//G, N) for w4
    mode: str = dataclasses.field(metadata=dict(static=True), default="w8a8")
    group_size: int = dataclasses.field(metadata=dict(static=True), default=128)
    # Two-level mode only: per-group integer multipliers (K//G, N) int8 in
    # [1, 15]; the effective group scale is mult * scale[None, :].
    mult: Optional[jax.Array] = None
    # Two-level at-rest nibble layout: adjacent-group pairing
    # (`pack_uint4_offset_paired`, the concat-free kernel's format) vs the
    # group-halves layout. Static and carried WITH the weights — kernels and
    # oracles must never re-derive it from (possibly sharded) local shapes.
    paired: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Stacked-serving form only (`fuse_stacked_layers`): `mult` nibble-packed
    # 8 groups per int32 (`pack_mult_nibbles`) for the layer-indexed decode
    # GEMV. `mult` itself is kept for the prefill dequant path.
    mult_packed: Optional[jax.Array] = None
    # Static-A8 mode: calibrated per-tensor input scale (scalar f32; (L,)
    # when stacked). When set, int8-activation modes quantize the input on
    # this fixed grid instead of dynamic per-row amax — carrying the
    # sim-tier input LinearQuantizer's calibration into execution
    # (VERDICT round-1 item 6; reference `nn/linear.py:20-39` pattern).
    in_scale: Optional[jax.Array] = None

    def _quantize_input(self, x2: jax.Array):
        if self.in_scale is not None:
            return quantize_static(x2, self.in_scale)
        return quantize_rowwise(x2)

    def __call__(self, x: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
        """Apply y = x @ W with the mode's kernel. x: (..., K)."""
        lead = x.shape[:-1]
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        if self.mode == "w8a8":
            x_q, x_s = self._quantize_input(x2)
            out = matmul_w8a8(x_q, x_s, self.data, self.scale, out_dtype=out_dtype)
        elif self.mode == "w4a8":
            x_q, x_s = self._quantize_input(x2)
            out = matmul_w4a8(
                x_q, x_s, self.data, self.scale,
                group_size=self.group_size, out_dtype=out_dtype,
            )
        elif self.mode == "w4a8_2l":
            x_q, x_s = self._quantize_input(x2)
            if x2.shape[0] <= _GEMV_MAX_M or not _on_tpu():
                out = matmul_w4a8_2l_gemv(
                    x_q, x_s, self.data, self.mult, self.scale,
                    group_size=self.group_size, out_dtype=out_dtype,
                    paired=self.paired,
                )
            else:
                # Prefill: effective per-group scales are exactly
                # mult * s_col — reuse the one-pass dequant + XLA matmul.
                s_eff = self.mult.astype(jnp.float32) * self.scale[None, :]
                w = dequantize_int4(
                    self.data, s_eff, self.group_size, offset_binary=True,
                    paired=self.paired,
                )
                xb = (x_q.astype(jnp.float32) * x_s[:, None]).astype(jnp.bfloat16)
                out = jax.lax.dot(
                    xb, w, preferred_element_type=jnp.float32
                ).astype(out_dtype)
        elif self.mode == "w4a4_2l":
            if x2.shape[0] <= _GEMV_MAX_M or not _on_tpu():
                x_q, x_s = quantize_rowwise_a4(x2)
                out = matmul_w4a4_2l_gemv(
                    x_q, x_s, self.data, self.mult, self.scale,
                    group_size=self.group_size, out_dtype=out_dtype,
                )
            else:
                # Prefill: A4-grid activations expanded to bf16 against the
                # dequantized weight (the W4A8 prefill policy: same grid as
                # decode, full-rate bf16 MXU matmul).
                x_q, x_s = quantize_rowwise_a4(x2)
                s_eff = self.mult.astype(jnp.float32) * self.scale[None, :]
                w = dequantize_int4_vertical(
                    self.data, s_eff, self.group_size
                )
                xb = (x_q.astype(jnp.float32) * x_s[:, None]).astype(jnp.bfloat16)
                out = jax.lax.dot(
                    xb, w, preferred_element_type=jnp.float32
                ).astype(out_dtype)
        elif self.mode == "w4a16":
            out = matmul_w4a16(
                x2.astype(jnp.bfloat16), self.data, self.scale,
                group_size=self.group_size, out_dtype=out_dtype,
            )
        elif self.mode in ("sim_w8", "sim_w4"):
            # Reference-style fake quantization: weights stored dense bf16
            # and quantize-dequantized on every use (the reference's only
            # tier, `_quantizer_impl.py:144-190`). Used as the bench baseline.
            w = self.data.astype(jnp.float32)
            if self.mode == "sim_w8":
                q = jnp.clip(jnp.round(w / self.scale[None, :]), -128, 127)
                w = q * self.scale[None, :]
            else:
                g = self.group_size
                n_groups = w.shape[0] // g
                wg = w.reshape(n_groups, g, -1)
                q = jnp.clip(jnp.round(wg / self.scale[:, None, :]), -8, 7)
                w = (q * self.scale[:, None, :]).reshape(w.shape[0], -1)
            out = (x2.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)).astype(out_dtype)
        else:
            raise ValueError(f"unknown mode {self.mode}")
        return out.reshape(*lead, -1)

    def call_layer(self, x: jax.Array, layer: jax.Array,
                   out_dtype=jnp.bfloat16) -> jax.Array:
        """Apply layer ``layer`` of *stacked* (L, ...) weights: y = x @ W[l].

        For the decode-shaped two-level W4A8 path the layer index is passed
        into the Pallas kernel via scalar prefetch, so no per-layer weight
        slice is ever materialized (the dominant hidden cost of scanning
        over stacked weights — see `matmul_w4a8_2l_gemv_stacked`). Other
        modes (and prefill-shaped inputs) slice the layer out and reuse the
        standard `__call__`, which matches the previous scan-over-weights
        behavior.
        """
        lead = x.shape[:-1]
        K = x.shape[-1]
        x2 = x.reshape(-1, K)

        def quant_in(x2):
            if self.in_scale is not None:
                sc = self.in_scale
                if sc.ndim >= 1 and sc.shape[0] == self.data.shape[0]:
                    sc = jax.lax.dynamic_index_in_dim(sc, layer, keepdims=False)
                return quantize_static(x2, sc)
            return quantize_rowwise(x2)

        if (
            self.mode == "w4a8_2l"
            and self.paired
            and self.mult_packed is not None
            and x2.shape[0] <= _GEMV_MAX_M
            and _on_tpu()
        ):
            x_q, x_s = quant_in(x2)
            out = matmul_w4a8_2l_gemv_stacked(
                x_q, x_s, self.data, self.mult_packed, self.scale, layer,
                group_size=self.group_size, out_dtype=out_dtype,
            )
            return out.reshape(*lead, -1)
        if (
            self.mode == "w4a4_2l"
            and self.mult_packed is not None
            and x2.shape[0] <= _GEMV_MAX_M
        ):
            x_q, x_s = quantize_rowwise_a4(x2)
            out = matmul_w4a4_2l_gemv_stacked(
                x_q, x_s, self.data, self.mult_packed, self.scale, layer,
                group_size=self.group_size, out_dtype=out_dtype,
            )
            return out.reshape(*lead, -1)
        if (
            self.mode == "w4a4_2l"
            and self.mult is not None
            and x2.shape[0] > _GEMV_MAX_M
            and _on_tpu()
        ):
            # Prefill-shaped stacked W4A4: layer-indexed vertical dequant —
            # no per-layer slice of packed weights is ever materialized
            # (2.3x TTFT at prompt 512 without it; kernels/matmul.py
            # dequantize_int4_vertical_stacked). Activations on the A4 grid
            # expanded to bf16, matching __call__'s prefill policy.
            from fastforward_tpu.kernels.matmul import (
                dequantize_int4_vertical_stacked,
            )

            x_q, x_s = quantize_rowwise_a4(x2)
            w = dequantize_int4_vertical_stacked(
                self.data, self.mult, self.scale, layer,
                group_size=self.group_size,
            )
            xb = (x_q.astype(jnp.float32) * x_s[:, None]).astype(jnp.bfloat16)
            out = jax.lax.dot(xb, w, preferred_element_type=jnp.float32)
            return out.astype(out_dtype).reshape(*lead, -1)
        if (
            self.mode == "w4a8_2l"
            and self.paired
            and self.mult is not None
            and x2.shape[0] > _GEMV_MAX_M
            and _on_tpu()
        ):
            # Prefill-shaped (M > GEMV) stacked weights: layer-indexed
            # one-pass dequant + XLA full-rate matmul — no per-layer slice
            # of the packed weights/multipliers/scales is ever materialized
            # (kernels/matmul.py:dequantize_int4_paired_stacked).
            from fastforward_tpu.kernels.matmul import (
                dequantize_int4_paired_stacked,
            )

            x_q, x_s = quant_in(x2)
            w = dequantize_int4_paired_stacked(
                self.data, self.mult, self.scale, layer,
                group_size=self.group_size,
            )
            xb = (x_q.astype(jnp.float32) * x_s[:, None]).astype(jnp.bfloat16)
            out = jax.lax.dot(xb, w, preferred_element_type=jnp.float32)
            return out.astype(out_dtype).reshape(*lead, -1)
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, keepdims=False)
        in_scale = self.in_scale
        if in_scale is not None and in_scale.ndim >= 1 \
                and in_scale.shape[0] == self.data.shape[0]:
            in_scale = idx(in_scale)
        data = idx(self.data)
        if data.ndim == 3:
            # Pre-blocked stacked layout (L, N//bn, K//2, bn) — restore the
            # flat (K//2, N) form for the per-layer fallback.
            nb, kh, bn = data.shape
            data = data.transpose(1, 0, 2).reshape(kh, nb * bn)
        sliced = QuantLinear(
            data, idx(self.scale), mode=self.mode,
            group_size=self.group_size,
            mult=None if self.mult is None else idx(self.mult),
            paired=self.paired,
            in_scale=in_scale,
        )
        return sliced(x, out_dtype=out_dtype)


def quantize_static(x2: jax.Array, scale: jax.Array):
    """Static symmetric int8 activation quantization on a calibrated
    per-tensor grid: returns (x_q int8, per-row scale) — the same contract
    as `quantize_rowwise` so the matmul kernels are agnostic to the mode."""
    sc = jnp.asarray(scale, jnp.float32).reshape(())
    x_q = jnp.clip(
        jnp.round(x2.astype(jnp.float32) / sc), -127, 127
    ).astype(jnp.int8)
    return x_q, jnp.broadcast_to(sc, (x2.shape[0],))


def quantize_linear(
    w: jax.Array, mode: str, group_size: int = 128, scale: Optional[jax.Array] = None
) -> QuantLinear:
    """Quantize a dense (K, N) weight into frozen storage.

    ``scale``: optional externally calibrated scales (per-out-channel (N,)
    for w8; per-group (K//g, N) for w4) — e.g. from a sim-tier
    LinearQuantizer or GPTQ. Defaults to symmetric min-max.
    """
    w = jnp.asarray(w, jnp.float32)
    K, N = w.shape
    if mode == "w8a8":
        if scale is None:
            scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-8)
        scale = jnp.asarray(scale, jnp.float32).reshape(N)
        q = jnp.clip(jnp.round(w / scale[None, :]), -128, 127).astype(jnp.int8)
        return QuantLinear(q, scale, mode="w8a8")
    if mode in ("w4a8", "w4a16", "w4a8_2l", "w4a4_2l"):
        g = group_size if K % group_size == 0 else K
        wg = w.reshape(K // g, g, N)
        if scale is None:
            scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)  # (K//g, N)
        scale = jnp.asarray(scale, jnp.float32).reshape(K // g, N)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -8, 7).astype(jnp.int8)
        packed = pack_int4(q.reshape(K, N), group_size=g)
        if mode == "w4a8_2l":
            paired = (
                flags.default_paired_layout() and (K // g) % 2 == 0
            )
            packed, mult, s_col = convert_two_level(packed, scale, g, paired=paired)
            return QuantLinear(
                packed, s_col, mode=mode, group_size=g, mult=mult, paired=paired
            )
        if mode == "w4a4_2l":
            packed, mult, s_col = convert_two_level_a4(packed, scale, g)
            return QuantLinear(
                packed, s_col, mode=mode, group_size=g, mult=mult, paired=False
            )
        return QuantLinear(packed, scale, mode=mode, group_size=g)
    raise ValueError(f"unknown mode {mode}")


def _scale_from_quantizer(module, w_shape, mode: str, group_size: int):
    """Extract frozen-storage scales from an initialized sim-tier weight
    quantizer on ``module`` (LinearQuantizer with a symmetric grid), if its
    granularity matches the serving mode's layout. Returns None otherwise."""
    from fastforward_tpu.nn.linear_quantizer import LinearQuantizer
    from fastforward_tpu.quantization.granularity import PerBlock, PerChannel

    q = getattr(module, "weight_quantizer", None)
    if not isinstance(q, LinearQuantizer) or q.scale is None or q.offset is not None:
        return None
    K, N = w_shape
    scale = q.scale.value.reshape(-1)
    gran = q.granularity
    if mode == "w8a8":
        if q.num_bits != 8:
            return None
        if isinstance(gran, PerChannel) and gran.channel_dims == (1,) and scale.size == N:
            return scale
        if scale.size == 1:
            return jnp.broadcast_to(scale, (N,))
        return None
    if q.num_bits != 4:
        return None
    g = group_size if K % group_size == 0 else K
    if isinstance(gran, PerBlock):
        tile = gran.tile_size(w_shape)
        if tile == (g, 1):
            return scale.reshape(K // g, N)
    return None


def _input_scale_from_quantizer(module):
    """Calibrated static activation scale from an initialized symmetric
    per-tensor 8-bit input LinearQuantizer on ``module`` (else None)."""
    from fastforward_tpu.nn.linear_quantizer import LinearQuantizer
    from fastforward_tpu.quantization.granularity import PerTensor

    q = getattr(module, "input_quantizer", None)
    if not isinstance(q, LinearQuantizer) or q.scale is None:
        return None
    if q.offset is not None or q.num_bits != 8:
        return None
    if not isinstance(q.granularity, PerTensor):
        return None
    return jnp.asarray(q.scale.value, jnp.float32).reshape(())


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ServingLayer:
    q_proj: QuantLinear
    k_proj: QuantLinear
    v_proj: QuantLinear
    o_proj: QuantLinear
    gate_proj: QuantLinear
    up_proj: QuantLinear
    down_proj: QuantLinear
    input_norm: jax.Array
    post_norm: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ServingParams:
    embedding: jax.Array  # (vocab, hidden) bf16
    layers: tuple
    final_norm: jax.Array
    lm_head: Optional[QuantLinear]  # None => tied embeddings


def freeze_llama(model, mode: str = "w4a8", group_size: int = 128,
                 static_activations: bool = False) -> ServingParams:
    """Convert an (NNX) LlamaForCausalLM into frozen serving params.

    When the model was calibrated/GPTQ'd in the simulation tier (its
    QuantizedLinear weight quantizers hold symmetric grids of matching
    granularity), those exact scales carry over — the analog of
    `quantization/freeze.py` but into true low-bit storage, guaranteeing the
    execution tier reproduces the simulated grid bit-for-bit.

    ``static_activations``: additionally lift calibrated *input* quantizer
    ranges (symmetric per-tensor 8-bit LinearQuantizers, i.e. the ranges
    `estimate_ranges` produced) into `QuantLinear.in_scale` — activations
    then quantize on the sim-calibrated static grid instead of dynamic
    per-token amax. Layers whose input quantizer is absent/uninitialized
    stay dynamic.
    """

    def ql(module):
        w = module.kernel.value
        scale = _scale_from_quantizer(module, w.shape, mode, group_size)
        out = quantize_linear(w, mode, group_size, scale=scale)
        if static_activations:
            in_scale = _input_scale_from_quantizer(module)
            if in_scale is not None:
                out = dataclasses.replace(out, in_scale=in_scale)
        return out

    layers = []
    for block in model.layers:
        attn, mlp = block.self_attn, block.mlp
        layers.append(
            ServingLayer(
                q_proj=ql(attn.q_proj),
                k_proj=ql(attn.k_proj),
                v_proj=ql(attn.v_proj),
                o_proj=ql(attn.o_proj),
                gate_proj=ql(mlp.gate_proj),
                up_proj=ql(mlp.up_proj),
                down_proj=ql(mlp.down_proj),
                input_norm=jnp.asarray(block.input_layernorm.scale.value, jnp.bfloat16),
                post_norm=jnp.asarray(block.post_attention_layernorm.scale.value, jnp.bfloat16),
            )
        )
    lm_head = None
    if model.lm_head is not None:
        # A4 applies to the decoder matmuls only: the lm_head keeps A8 (the
        # logits head is the most scale-sensitive matmul, and its fused
        # GEMV+argmax kernel is the w4a8_2l one) — the QServe-style W4A8
        # head policy.
        head_mode = "w4a8_2l" if mode == "w4a4_2l" else mode
        lm_head = quantize_linear(model.lm_head.kernel.value, head_mode, group_size)
    return ServingParams(
        embedding=jnp.asarray(model.embed_tokens.embedding.value, jnp.bfloat16),
        layers=tuple(layers),
        final_norm=jnp.asarray(model.norm.scale.value, jnp.bfloat16),
        lm_head=lm_head,
    )


def random_serving_params(
    config: LlamaConfig, mode: str = "w4a8", group_size: int = 128, seed: int = 0
) -> ServingParams:
    """Random-weight serving params built layer-by-layer (no full bf16 model
    is ever materialized — required to stage an 8B model on one 16GB chip)."""
    h, inter = config.hidden_size, config.intermediate_size
    nh, nkv, d = config.num_heads, config.num_kv_heads, config.head_dim
    key = jax.random.PRNGKey(seed)

    def ql(key, k_dim, n_dim, mode=mode):
        # Directly fabricate quantized storage — no fp32 intermediate.
        k1, k2 = jax.random.split(key)
        if mode == "w8a8":
            data = jax.random.randint(k1, (k_dim, n_dim), -127, 128, dtype=jnp.int8)
            scale = jnp.full((n_dim,), 0.02 / np.sqrt(k_dim), jnp.float32)
            return QuantLinear(data, scale, mode="w8a8")
        g = group_size if k_dim % group_size == 0 else k_dim
        q = jax.random.randint(k1, (k_dim, n_dim), -8, 8, dtype=jnp.int8)
        packed = pack_int4(q, group_size=g)
        if mode in ("w4a8_2l", "w4a4_2l"):
            mult = jax.random.randint(k2, (k_dim // g, n_dim), 1, 16, dtype=jnp.int8)
            s_col = jnp.full((n_dim,), 0.25 / np.sqrt(k_dim) / 8.0, jnp.float32)
            if mode == "w4a4_2l":
                from fastforward_tpu.kernels.packing import pack_int4_vertical

                packed = pack_int4_vertical(
                    jax.random.randint(k1, (k_dim, n_dim), -8, 8, dtype=jnp.int8)
                )
            return QuantLinear(packed, s_col, mode=mode, group_size=g, mult=mult)
        scale = jnp.full((k_dim // g, n_dim), 0.25 / np.sqrt(k_dim), jnp.float32)
        return QuantLinear(packed, scale, mode=mode, group_size=g)

    layers = []
    for i in range(config.num_layers):
        key, *ks = jax.random.split(key, 8)
        layers.append(
            ServingLayer(
                q_proj=ql(ks[0], h, nh * d),
                k_proj=ql(ks[1], h, nkv * d),
                v_proj=ql(ks[2], h, nkv * d),
                o_proj=ql(ks[3], nh * d, h),
                gate_proj=ql(ks[4], h, inter),
                up_proj=ql(ks[5], h, inter),
                down_proj=ql(ks[6], inter, h),
                input_norm=jnp.ones((h,), jnp.bfloat16),
                post_norm=jnp.ones((h,), jnp.bfloat16),
            )
        )
    key, k1, k2 = jax.random.split(key, 3)
    embedding = (jax.random.normal(k1, (config.vocab_size, h), jnp.bfloat16) * 0.02)
    head_mode = "w4a8_2l" if mode == "w4a4_2l" else mode  # see freeze_llama
    lm_head = (
        None if config.tie_embeddings else ql(k2, h, config.vocab_size, head_mode)
    )
    return ServingParams(
        embedding=embedding,
        layers=tuple(layers),
        final_norm=jnp.ones((h,), jnp.bfloat16),
        lm_head=lm_head,
    )


# --- functional forward ------------------------------------------------------


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return out.astype(dt) * weight


def _attention(q, k, v, mask):
    """(B, H, T, D) attention with additive mask; fp32 softmax."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", weights, v)


def _attention_grouped(q, k, v, mask):
    """GQA attention without materializing repeated K/V: q (B, H, T, d)
    against shared k/v (B, Hkv, S, d) via a grouped einsum. The score
    tensor is the same size as MHA's, but the (groups×) dequantized KV
    copy `jnp.repeat` used to make never exists."""
    B, H, T, d = q.shape
    Hkv = k.shape[1]
    g = H // Hkv
    if g == 1:
        return _attention(q, k, v, mask)
    scale = 1.0 / np.sqrt(d)
    q5 = q.reshape(B, Hkv, g, T, d)
    scores = jnp.einsum("bkgtd,bksd->bkgts", q5, k).astype(jnp.float32) * scale
    if mask is not None:
        # mask (B or 1, 1, T, S) broadcasts over the kv-head and group axes
        scores = scores + mask[:, :, None]
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bksd->bkgtd", weights, v)
    return out.reshape(B, H, T, d)


def serving_forward(
    params: ServingParams,
    config: LlamaConfig,
    input_ids: jax.Array,
    cache: Optional[KVCache] = None,
    positions: Optional[jax.Array] = None,
    logits_positions: str = "all",
):
    """One forward pass; returns (logits, new_cache).

    ``logits_positions``: "all" (default), "last" (serving prefill — the
    (B, T, vocab) fp32 logits are never materialized, the memory cap for
    large-batch prefill), or a (B,) int array of per-row positions."""
    B, T = input_ids.shape
    nh, nkv, d = config.num_heads, config.num_kv_heads, config.head_dim
    inv_freq = rope_frequencies(config)

    if positions is None:
        positions = jnp.arange(T)
        if cache is not None:
            positions = positions + cache.length

    x = params.embedding[input_ids]  # (B, T, H) bf16

    def split_heads(t, n):
        return t.reshape(B, T, n, d).transpose(0, 2, 1, 3)

    new_layers = []
    for i, layer in enumerate(params.layers):
        h = _rms_norm(x, layer.input_norm, config.rms_norm_eps)
        q = split_heads(layer.q_proj(h), nh)
        k = split_heads(layer.k_proj(h), nkv)
        v = split_heads(layer.v_proj(h), nkv)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        groups = nh // nkv
        if cache is not None:
            lc = cache.layer(i).append(k, v, positions)
            new_layers.append(lc)
            starts = (
                positions[:, 0] if positions.ndim == 2
                else jnp.broadcast_to(positions[0], (B,))
            )
            if T > 1 and positions.ndim == 1 and flags.use_flash_prefill():
                # Prefill through the just-appended cache: blocked flash
                # attention on TPU (no (T, S) score materialization, no GQA
                # repeat, int8 KV consumed in-register); off-TPU the same
                # entry point runs its XLA reference — one implementation
                # for the GSPMD/loader path and the stacked engine
                # (kernels/attention.py:flash_prefill).
                from fastforward_tpu.kernels.attention import flash_prefill

                attn = flash_prefill(
                    q, lc.k, lc.k_scale, lc.v, lc.v_scale, starts
                )
            elif (
                T == 1 and lc.is_quantized and groups >= 2
                and _on_tpu() and flags.use_flash_attention()
            ):
                # Decode step: stream the int8 cache through the SHARED
                # flash-decode dispatch (serving/stacked.py:
                # flash_decode_select) — one regime selection
                # (ragged/bucketed/whole-S) for the GSPMD and stacked
                # paths; the per-layer cache is [None]-lifted to the
                # layer-indexed kernels at layer 0.
                from fastforward_tpu.serving.stacked import (
                    flash_decode_select,
                )

                attn = flash_decode_select(
                    q[:, :, 0, :], lc.k, lc.k_scale, lc.v, lc.v_scale,
                    lengths=starts + 1, layer=None,
                )[:, :, None, :]
            else:
                k_all, v_all = lc.read(dtype=x.dtype)
                mask = lc.attention_mask(positions)
                attn = _attention_grouped(q, k_all, v_all, mask)
        else:
            s = jnp.arange(T)
            causal = s[None, None, None, :] <= positions.reshape(1, 1, T, 1)
            mask = jnp.where(causal, 0.0, -1e30).astype(jnp.float32)
            attn = _attention_grouped(q, k, v, mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, nh * d)
        x = x + layer.o_proj(attn)

        h = _rms_norm(x, layer.post_norm, config.rms_norm_eps)
        gated = jax.nn.silu(layer.gate_proj(h).astype(jnp.float32)).astype(x.dtype)
        x = x + layer.down_proj(gated * layer.up_proj(h))

    x = _rms_norm(x, params.final_norm, config.rms_norm_eps)
    if isinstance(logits_positions, str):
        if logits_positions == "last":
            x = x[:, -1:, :]
    else:
        x = jnp.take_along_axis(
            x, jnp.asarray(logits_positions)[:, None, None], axis=1
        )
    if params.lm_head is not None:
        logits = params.lm_head(x, out_dtype=jnp.float32)
    else:
        logits = jnp.einsum("bth,vh->btv", x, params.embedding).astype(jnp.float32)

    if cache is not None:
        cache = cache.with_layers(new_layers, advance=T)
    return logits, cache


def make_decode_loop(config: LlamaConfig, num_steps: int):
    """Build a jitted greedy-decode loop: (params, cache, first_token) →
    (tokens (B, num_steps), final cache). The whole loop is one XLA program
    (lax.scan), so relay/dispatch overhead amortizes across steps."""

    def loop(params: ServingParams, cache: KVCache, token: jax.Array):
        def step(carry, _):
            cache, token = carry
            logits, cache = serving_forward(params, config, token, cache)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(token.dtype)[:, None]
            return (cache, nxt), nxt[:, 0]

        (cache, _), tokens = jax.lax.scan(step, (cache, token), None, length=num_steps)
        return tokens.T, cache

    return jax.jit(loop, donate_argnums=(1,))


def repack_unpaired(ql: QuantLinear) -> QuantLinear:
    """Convert a paired-layout two-level `QuantLinear` to group-halves layout.

    Row-parallel tensor sharding splits the K axis; when a shard would hold
    an odd number of groups, the adjacent-group pairing cannot survive the
    split — the weight is repacked once at placement time (pure relabeling,
    bit-exact).
    """
    if not ql.paired:
        return ql
    from fastforward_tpu.kernels.packing import (
        pack_uint4_offset,
        unpack_uint4_offset_paired,
    )

    g = ql.group_size

    def conv(d2):
        return pack_uint4_offset(unpack_uint4_offset_paired(d2, g), g)

    data = jax.vmap(conv)(ql.data) if ql.data.ndim == 3 else conv(ql.data)
    return QuantLinear(
        data, ql.scale, mode=ql.mode, group_size=ql.group_size, mult=ql.mult,
        paired=False,
    )
