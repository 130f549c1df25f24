from fastforward_tpu.serving.kv_cache import KVCache, LayerKVCache

__all__ = ["KVCache", "LayerKVCache"]
