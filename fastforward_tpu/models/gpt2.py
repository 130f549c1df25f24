"""GPT-2 in NNX (BASELINE config 2: W8A8 per-channel calibration target).

A clean TPU-native decoder: channels-last everywhere, attention through the
quantizer-parameterized SDPA op, all matmuls through nnx.Linear so
`quantize_model` converts the whole network. The reference has no model zoo —
it quantizes HF models via autoquant; we ship the architectures directly
(the equivalent of `docs/doc_helpers/quantized_llama/` in the reference).
"""

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import nnx

from fastforward_tpu import ops
from fastforward_tpu.nn.quantized_module import QuantizedModule
from fastforward_tpu.nn.quantizer import QuantizerStub


@dataclasses.dataclass
class GPT2Config:
    vocab_size: int = 50257
    max_position_embeddings: int = 1024
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: Optional[int] = None
    layer_norm_epsilon: float = 1e-5
    dtype: type = jnp.float32

    @property
    def ffn_dim(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @staticmethod
    def small() -> "GPT2Config":
        return GPT2Config()

    @staticmethod
    def tiny() -> "GPT2Config":
        return GPT2Config(
            vocab_size=256, max_position_embeddings=64, hidden_size=32,
            num_layers=2, num_heads=2,
        )


class GPT2Attention(nnx.Module):
    def __init__(self, config: GPT2Config, *, rngs: nnx.Rngs):
        h = config.hidden_size
        self.num_heads = config.num_heads
        self.head_dim = h // config.num_heads
        self.c_attn = nnx.Linear(h, 3 * h, param_dtype=config.dtype, rngs=rngs)
        self.c_proj = nnx.Linear(h, h, param_dtype=config.dtype, rngs=rngs)

    def _sdpa_quantizers(self) -> dict:
        # Overridden by the quantized counterpart; read dynamically so that
        # quantizer replacement (config rules, estimators) is always seen.
        return {}

    def __call__(self, x, attn_mask=None):
        B, T, H = x.shape[0], x.shape[1], self.num_heads
        qkv = self.c_attn(x)
        from fastforward_tpu.quantization.quantized_array import QuantizedArray

        if isinstance(qkv, QuantizedArray):
            qkv = qkv.dequantize()
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, self.head_dim).transpose(0, 2, 1, 3)

        out = ops.scaled_dot_product_attention(
            heads(q), heads(k), heads(v), attn_mask=attn_mask, is_causal=True,
            strict_quantization=False, **self._sdpa_quantizers(),
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.c_proj(out)


class QuantizedGPT2Attention(QuantizedModule, GPT2Attention):
    """Quantized counterpart: adds SDPA intermediate quantizer slots
    (the reference's quantizer-parameterized SDPA, `custom/sdpa.py:18-93`)."""

    def __init_quantization__(self):
        super().__init_quantization__()
        self.attn_scores_quantizer = QuantizerStub("activation/attn_scores")
        self.attn_weights_quantizer = QuantizerStub("activation/attn_weights")
        self.attn_output_quantizer = QuantizerStub(output_quantizer=True)

    def _sdpa_quantizers(self) -> dict:
        return dict(
            attn_scores_quantizer=self.attn_scores_quantizer,
            attn_weights_quantizer=self.attn_weights_quantizer,
        )


class GPT2Block(nnx.Module):
    def __init__(self, config: GPT2Config, *, rngs: nnx.Rngs):
        h = config.hidden_size
        self.ln_1 = nnx.LayerNorm(h, epsilon=config.layer_norm_epsilon,
                                  param_dtype=config.dtype, rngs=rngs)
        self.attn = GPT2Attention(config, rngs=rngs)
        self.ln_2 = nnx.LayerNorm(h, epsilon=config.layer_norm_epsilon,
                                  param_dtype=config.dtype, rngs=rngs)
        self.fc_in = nnx.Linear(h, config.ffn_dim, param_dtype=config.dtype, rngs=rngs)
        self.fc_out = nnx.Linear(config.ffn_dim, h, param_dtype=config.dtype, rngs=rngs)

    def __call__(self, x, attn_mask=None):
        from fastforward_tpu.quantization.quantized_array import dequantize_if_quantized as dq

        x = x + dq(self.attn(dq(self.ln_1(x)), attn_mask))
        h = dq(self.fc_in(dq(self.ln_2(x))))
        h = ops.gelu(h, approximate="tanh", strict_quantization=False)
        return x + dq(self.fc_out(dq(h)))


class GPT2LMHead(nnx.Module):
    """GPT-2 with an LM head (weights tied to the token embedding)."""

    def __init__(self, config: GPT2Config, *, rngs: nnx.Rngs):
        self.config = config
        self.wte = nnx.Embed(config.vocab_size, config.hidden_size,
                             param_dtype=config.dtype, rngs=rngs)
        self.wpe = nnx.Embed(config.max_position_embeddings, config.hidden_size,
                             param_dtype=config.dtype, rngs=rngs)
        self.blocks = nnx.data([GPT2Block(config, rngs=rngs) for _ in range(config.num_layers)])
        self.ln_f = nnx.LayerNorm(config.hidden_size, epsilon=config.layer_norm_epsilon,
                                  param_dtype=config.dtype, rngs=rngs)

    def __call__(self, input_ids, attn_mask=None):
        from fastforward_tpu.quantization.quantized_array import dequantize_if_quantized as dq

        T = input_ids.shape[-1]
        pos = jnp.arange(T)
        x = dq(self.wte(input_ids)) + dq(self.wpe(pos))
        for block in self.blocks:
            x = block(x, attn_mask)
        x = dq(self.ln_f(x))
        # Tied LM head: logits = x @ wte^T
        return x @ dq(self.wte.embedding.value).T
