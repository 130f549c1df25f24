"""Llama-family models in NNX (BASELINE configs 3-5).

TPU-native decoder with GQA, RoPE and KV-cache support built in from the
start — the cache is a functional pytree passed in and out of `__call__`, so
prefill and decode jit into static-shape programs (cache length is a traced
scalar; attention masks do the windowing).

The reference has no model code of its own — it quantizes HF torch models via
autoquant (`docs/doc_helpers/quantized_llama/`); here the architecture is a
first-class citizen so the execution tier (Pallas W4A8 kernels, INT8 KV) can
own every hot op.
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx

from fastforward_tpu import ops
from fastforward_tpu.nn.quantized_module import QuantizedModule
from fastforward_tpu.nn.quantizer import QuantizerStub
from fastforward_tpu.quantization.quantized_array import dequantize_if_quantized as _dq


@dataclasses.dataclass
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 8192
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama32_1b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=2048, intermediate_size=8192, num_layers=16,
            num_heads=32, num_kv_heads=8, head_dim=64, tie_embeddings=True,
        )

    @staticmethod
    def llama3_70b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=8192, intermediate_size=28672, num_layers=80,
            num_heads=64, num_kv_heads=8,
        )

    @staticmethod
    def tiny() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, max_seq_len=128,
            dtype=jnp.float32,
        )


# --- RoPE ---------------------------------------------------------------------


def rope_frequencies(config: LlamaConfig) -> jax.Array:
    dim = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    return inv_freq  # (dim/2,)


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate ``x`` (B, H, T, D) by position-dependent angles (llama
    rotate-half convention). ``positions``: (B, T) or (T,)."""
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, None, :, None].astype(jnp.float32) * inv_freq  # (B,1,T,D/2)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# --- modules -------------------------------------------------------------------


class LlamaAttention(nnx.Module):
    def __init__(self, config: LlamaConfig, *, rngs: nnx.Rngs):
        h, d = config.hidden_size, config.head_dim
        self.num_heads = config.num_heads
        self.num_kv_heads = config.num_kv_heads
        self.head_dim = d
        kw = dict(use_bias=False, param_dtype=config.dtype, rngs=rngs)
        self.q_proj = nnx.Linear(h, config.num_heads * d, **kw)
        self.k_proj = nnx.Linear(h, config.num_kv_heads * d, **kw)
        self.v_proj = nnx.Linear(h, config.num_kv_heads * d, **kw)
        self.o_proj = nnx.Linear(config.num_heads * d, h, **kw)
        self._inv_freq = rope_frequencies(config)

    def _sdpa_quantizers(self) -> dict:
        # Overridden by the quantized counterpart; read dynamically so that
        # quantizer replacement (config rules, estimators) is always seen.
        return {}

    @property
    def kv_quantizer(self):
        return getattr(self, "kv_cache_quantizer", None)

    def _split(self, t: jax.Array, n: int) -> jax.Array:
        B, T = t.shape[0], t.shape[1]
        return t.reshape(B, T, n, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x, positions, layer_cache=None, mask=None):
        """Returns (out, new_layer_cache). ``layer_cache`` is a
        `serving.kv_cache.LayerKVCache` or None (full self-attention)."""
        q = self._split(_dq(self.q_proj(x)), self.num_heads)
        k = self._split(_dq(self.k_proj(x)), self.num_kv_heads)
        v = self._split(_dq(self.v_proj(x)), self.num_kv_heads)

        q = apply_rope(q, positions, self._inv_freq)
        k = apply_rope(k, positions, self._inv_freq)

        if layer_cache is not None:
            layer_cache = layer_cache.append(k, v, positions, quantizer=self.kv_quantizer)
            k, v = layer_cache.read()
            attn_mask = layer_cache.attention_mask(positions, mask)
            is_causal = False
        else:
            attn_mask = mask
            is_causal = mask is None

        # GQA: expand kv heads to query heads.
        groups = self.num_heads // self.num_kv_heads
        if groups > 1:
            k = jnp.repeat(k, groups, axis=1)
            v = jnp.repeat(v, groups, axis=1)

        out = ops.scaled_dot_product_attention(
            q, k, v, attn_mask=attn_mask, is_causal=is_causal,
            strict_quantization=False, **self._sdpa_quantizers(),
        )
        B, T = x.shape[0], x.shape[1]
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1)
        return _dq(self.o_proj(out)), layer_cache


class QuantizedLlamaAttention(QuantizedModule, LlamaAttention):
    """Adds SDPA intermediate quantizer slots + the KV-cache quantizer slot."""

    def __init_quantization__(self):
        super().__init_quantization__()
        self.attn_scores_quantizer = QuantizerStub("activation/attn_scores")
        self.attn_weights_quantizer = QuantizerStub("activation/attn_weights")
        self.kv_cache_quantizer = QuantizerStub("activation/kv_cache")

    def _sdpa_quantizers(self) -> dict:
        return dict(
            attn_scores_quantizer=self.attn_scores_quantizer,
            attn_weights_quantizer=self.attn_weights_quantizer,
        )


class LlamaMLP(nnx.Module):
    def __init__(self, config: LlamaConfig, *, rngs: nnx.Rngs):
        kw = dict(use_bias=False, param_dtype=config.dtype, rngs=rngs)
        self.gate_proj = nnx.Linear(config.hidden_size, config.intermediate_size, **kw)
        self.up_proj = nnx.Linear(config.hidden_size, config.intermediate_size, **kw)
        self.down_proj = nnx.Linear(config.intermediate_size, config.hidden_size, **kw)

    def __call__(self, x):
        gate = ops.silu(_dq(self.gate_proj(x)), strict_quantization=False)
        h = _dq(gate) * _dq(self.up_proj(x))
        return _dq(self.down_proj(h))


class LlamaBlock(nnx.Module):
    def __init__(self, config: LlamaConfig, *, rngs: nnx.Rngs):
        self.input_layernorm = nnx.RMSNorm(
            config.hidden_size, epsilon=config.rms_norm_eps,
            param_dtype=config.dtype, rngs=rngs,
        )
        self.self_attn = LlamaAttention(config, rngs=rngs)
        self.post_attention_layernorm = nnx.RMSNorm(
            config.hidden_size, epsilon=config.rms_norm_eps,
            param_dtype=config.dtype, rngs=rngs,
        )
        self.mlp = LlamaMLP(config, rngs=rngs)

    def __call__(self, x, positions, layer_cache=None, mask=None):
        attn_out, layer_cache = self.self_attn(
            _dq(self.input_layernorm(x)), positions, layer_cache, mask
        )
        x = x + attn_out
        x = x + self.mlp(_dq(self.post_attention_layernorm(x)))
        return x, layer_cache


class LlamaForCausalLM(nnx.Module):
    def __init__(self, config: LlamaConfig, *, rngs: nnx.Rngs):
        self.config = config
        self.embed_tokens = nnx.Embed(
            config.vocab_size, config.hidden_size, param_dtype=config.dtype, rngs=rngs
        )
        self.layers = nnx.data([LlamaBlock(config, rngs=rngs) for _ in range(config.num_layers)])
        self.norm = nnx.RMSNorm(
            config.hidden_size, epsilon=config.rms_norm_eps,
            param_dtype=config.dtype, rngs=rngs,
        )
        if config.tie_embeddings:
            self.lm_head = None
        else:
            self.lm_head = nnx.Linear(
                config.hidden_size, config.vocab_size, use_bias=False,
                param_dtype=config.dtype, rngs=rngs,
            )

    def __call__(self, input_ids, positions=None, cache=None, mask=None):
        """Returns (logits, new_cache). ``cache`` is a serving.KVCache or None."""
        T = input_ids.shape[-1]
        if positions is None:
            positions = jnp.arange(T)
            if cache is not None:
                positions = positions + cache.length
        x = _dq(self.embed_tokens(input_ids))

        new_layers = []
        for i, block in enumerate(self.layers):
            layer_cache = None if cache is None else cache.layer(i)
            x, layer_cache = block(x, positions, layer_cache, mask)
            new_layers.append(layer_cache)

        x = _dq(self.norm(x))
        if self.lm_head is not None:
            logits = _dq(self.lm_head(x))
        else:
            logits = x @ _dq(self.embed_tokens.embedding.value).T

        if cache is not None:
            cache = cache.with_layers(new_layers, advance=T)
        return logits, cache
