"""KV cache: static-shape, jit-friendly, optionally INT8-quantized.

New TPU capability (the reference has no serving layer — SURVEY §2.9/§5):
the cache is a registered pytree of preallocated per-layer buffers. Appends
are `dynamic_update_slice` writes (vmapped over the batch so every sequence
can sit at a different offset — the primitive continuous batching needs), and
windowing is done with additive masks so every shape stays static under jit.

INT8 mode stores grid values plus one scale per (batch, head, token) —
dynamic symmetric per-token-head quantization, fused into the append. The
simulation tier dequantizes on read; the Pallas attention kernel
(`kernels/attention.py`) consumes the int8 buffers directly.
"""

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-(batch, head, token) int8 quantization of (B, H, T, D)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale.squeeze(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKVCache:
    """One layer's cache: k/v of (B, n_kv_heads, S_max, head_dim)."""

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array] = None  # (B, n_kv, S_max) when int8
    v_scale: Optional[jax.Array] = None

    @property
    def is_quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def append(
        self, k_new: jax.Array, v_new: jax.Array, positions: jax.Array,
        quantizer: Any = None,
    ) -> "LayerKVCache":
        """Write (B, n_kv, T, d) entries at per-batch offsets ``positions``.

        ``positions``: (T,) or (B, T) absolute positions; writes start at
        positions[..., 0] per batch row.
        """
        if quantizer is not None and not getattr(quantizer, "is_stub", True):
            # Simulation-tier KV quantizer (QDQ before storing).
            from fastforward_tpu.quantization.quantized_array import QuantizedArray

            kq = quantizer(k_new)
            vq = quantizer(v_new)
            k_new = kq.dequantize() if isinstance(kq, QuantizedArray) else kq
            v_new = vq.dequantize() if isinstance(vq, QuantizedArray) else vq

        if positions.ndim == 1:
            starts = jnp.broadcast_to(positions[0], (k_new.shape[0],))
        else:
            starts = positions[:, 0]

        T = k_new.shape[2]

        if self.is_quantized:
            kq8, ks = _quantize_kv(k_new)
            vq8, vs = _quantize_kv(v_new)

            if T == 1:
                # Decode-step append: Pallas in-place block write on TPU
                # (kernels/kv_update.py — touches only the tile holding the
                # row); masked select elsewhere. The vmapped
                # dynamic_update_slice lowers to an XLA scatter that TPU
                # runs as a serialized per-index loop (measured ~0.5
                # ms/layer at batch 32 on the stacked engine).
                from fastforward_tpu.kernels.kv_update import (
                    kv_append_decode_int8,
                )

                k2, v2, ks2, vs2 = kv_append_decode_int8(
                    self.k, self.v, self.k_scale, self.v_scale,
                    kq8, vq8, ks[..., :1], vs[..., :1], starts,
                )
                return LayerKVCache(k=k2, v=v2, k_scale=ks2, v_scale=vs2)

            def write(cache_b, new_b, idx):
                return jax.lax.dynamic_update_slice(cache_b, new_b, (0, idx, 0))

            def write_scale(cache_b, new_b, idx):
                return jax.lax.dynamic_update_slice(cache_b, new_b, (0, idx))

            return LayerKVCache(
                k=jax.vmap(write)(self.k, kq8, starts),
                v=jax.vmap(write)(self.v, vq8, starts),
                k_scale=jax.vmap(write_scale)(self.k_scale, ks.astype(self.k_scale.dtype), starts),
                v_scale=jax.vmap(write_scale)(self.v_scale, vs.astype(self.v_scale.dtype), starts),
            )

        if T == 1:
            sel4 = (
                jnp.arange(self.k.shape[2])[None, :] == starts[:, None]
            )[:, None, :, None]
            return LayerKVCache(
                k=jnp.where(sel4, k_new.astype(self.k.dtype), self.k),
                v=jnp.where(sel4, v_new.astype(self.v.dtype), self.v),
            )

        def write(cache_b, new_b, idx):
            return jax.lax.dynamic_update_slice(
                cache_b, new_b.astype(cache_b.dtype), (0, idx, 0)
            )

        return LayerKVCache(
            k=jax.vmap(write)(self.k, k_new, starts),
            v=jax.vmap(write)(self.v, v_new, starts),
        )

    def read(self, dtype: Any = None) -> tuple[jax.Array, jax.Array]:
        """Full-cache (B, n_kv, S_max, d) views, dequantized if int8."""
        if not self.is_quantized:
            return self.k, self.v
        dtype = dtype or jnp.bfloat16
        k = self.k.astype(jnp.float32) * self.k_scale[..., None]
        v = self.v.astype(jnp.float32) * self.v_scale[..., None]
        return k.astype(dtype), v.astype(dtype)

    def attention_mask(self, positions: jax.Array, extra_mask=None) -> jax.Array:
        """Additive mask (B or 1, 1, T, S_max): query at position p sees cache
        slots s <= p (covers causality and the unwritten tail in one)."""
        if positions.ndim == 1:
            positions = positions[None, :]
        s = jnp.arange(self.max_len)
        valid = s[None, None, None, :] <= positions[:, None, :, None]
        mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        if extra_mask is not None:
            mask = mask + extra_mask
        return mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Whole-model cache: a tuple of LayerKVCache + the current length."""

    layers: tuple
    length: jax.Array  # scalar int32

    @staticmethod
    def create(
        num_layers: int,
        batch_size: int,
        max_len: int,
        num_kv_heads: int,
        head_dim: int,
        dtype: Any = jnp.bfloat16,
        quantized: bool = False,
        scale_dtype: Any = jnp.float32,
    ) -> "KVCache":
        shape = (batch_size, num_kv_heads, max_len, head_dim)
        layers = []
        for _ in range(num_layers):
            if quantized:
                layers.append(
                    LayerKVCache(
                        k=jnp.zeros(shape, jnp.int8),
                        v=jnp.zeros(shape, jnp.int8),
                        k_scale=jnp.zeros(shape[:3], scale_dtype),
                        v_scale=jnp.zeros(shape[:3], scale_dtype),
                    )
                )
            else:
                layers.append(LayerKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype)))
        return KVCache(layers=tuple(layers), length=jnp.zeros((), jnp.int32))

    def layer(self, i: int) -> LayerKVCache:
        return self.layers[i]

    def with_layers(self, layers: Sequence[LayerKVCache], advance: int = 0) -> "KVCache":
        return KVCache(layers=tuple(layers), length=self.length + advance)

    @property
    def max_len(self) -> int:
        return self.layers[0].max_len

    @property
    def batch_size(self) -> int:
        return self.layers[0].k.shape[0]
