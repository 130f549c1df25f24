from fastforward_tpu.models.gpt2 import (
    GPT2Attention,
    GPT2Block,
    GPT2Config,
    GPT2LMHead,
    QuantizedGPT2Attention,
)
from fastforward_tpu.models.llama import (
    LlamaAttention,
    LlamaBlock,
    LlamaConfig,
    LlamaForCausalLM,
    LlamaMLP,
    QuantizedLlamaAttention,
)
from fastforward_tpu.models.mlp import MLP

__all__ = [
    "MLP",
    "GPT2Config",
    "GPT2LMHead",
    "GPT2Block",
    "GPT2Attention",
    "QuantizedGPT2Attention",
    "LlamaConfig",
    "LlamaForCausalLM",
    "LlamaBlock",
    "LlamaAttention",
    "LlamaMLP",
    "QuantizedLlamaAttention",
]
