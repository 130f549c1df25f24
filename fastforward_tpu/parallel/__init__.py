from fastforward_tpu.parallel.mesh import make_mesh
from fastforward_tpu.parallel.multihost import (
    host_local_batch_slice,
    initialize_distributed,
    make_hybrid_mesh,
)
from fastforward_tpu.parallel.context import context_parallel_attention, ring_attention
from fastforward_tpu.parallel.pipeline import pipeline_forward, pipeline_stage_loop
from fastforward_tpu.parallel.sharding import (
    batch_axes,
    shard_kv_cache,
    shard_serving_params,
    serving_param_spec,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "initialize_distributed",
    "host_local_batch_slice",
    "batch_axes",
    "shard_serving_params",
    "shard_kv_cache",
    "serving_param_spec",
    "ring_attention",
    "context_parallel_attention",
    "pipeline_forward",
    "pipeline_stage_loop",
]
