from fastforward_tpu.serving.kv_cache import KVCache, LayerKVCache
from fastforward_tpu.serving.moe import MoEBlock, expert_parallel_moe, make_moe_block, moe_forward
from fastforward_tpu.serving.sampling import SamplingParams, sample_logits

__all__ = [
    "KVCache",
    "LayerKVCache",
    "MoEBlock",
    "make_moe_block",
    "moe_forward",
    "expert_parallel_moe",
    "SamplingParams",
    "sample_logits",
]
