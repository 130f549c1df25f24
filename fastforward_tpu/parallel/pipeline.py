"""Pipeline parallelism: GPipe-style microbatching over a mesh axis.

New TPU capability (SURVEY §2.9 — the reference has no parallelism at all).
Layers are stacked along a leading axis and sharded over the ``stage`` mesh
axis; inside `shard_map` each device runs its contiguous block of layers and
rotates activations one hop around the ICI ring with `jax.lax.ppermute`.
The schedule is the classic GPipe fill-drain: ``T = M + S - 1`` ticks for
``M`` microbatches over ``S`` stages (bubble fraction ``(S-1)/T``); each tick
every stage computes one (possibly bubble) microbatch, so XLA overlaps the
per-tick ppermute with the next tick's compute.

Works with quantized layers as-is: stage parameters are pytrees (e.g. stacked
`QuantLinear` serving layers), sharded by a `P("stage")` prefix spec on their
leading layer axis — scales/multipliers shard with their packed weights.
"""

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def pipeline_stage_loop(
    stage_params: Any,
    x_microbatches: jax.Array,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    axis_name: str,
) -> jax.Array:
    """Run the fill-drain schedule for this device's stage (inside shard_map).

    ``stage_params``: the device-local stage parameters.
    ``x_microbatches``: (M, mb, ...) full input, replicated (only stage 0
    reads it). ``stage_fn(stage_params, h) -> h`` must preserve the
    activation shape (transformer-layer style).

    Returns the (M, mb, ...) outputs, replicated to every stage.
    """
    S = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    M = x_microbatches.shape[0]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    state = jnp.zeros_like(x_microbatches[0])
    out_buf = jnp.zeros_like(x_microbatches)

    def tick(carry, t):
        state, out_buf = carry
        # Stage 0 ingests microbatch t while filling.
        mb_idx = jnp.clip(t, 0, M - 1)
        x_in = jax.lax.dynamic_index_in_dim(
            x_microbatches, mb_idx, 0, keepdims=False
        )
        state = jnp.where((s == 0) & (t < M), x_in, state)

        valid = (t >= s) & (t - s < M)
        y = stage_fn(stage_params, state)
        y = jnp.where(valid, y, state)  # bubbles pass through untouched

        # Last stage records its finished microbatch.
        slot = jnp.clip(t - (S - 1), 0, M - 1)
        cur = jax.lax.dynamic_index_in_dim(out_buf, slot, 0, keepdims=False)
        new = jnp.where(valid & (s == S - 1), y, cur)
        out_buf = jax.lax.dynamic_update_index_in_dim(out_buf, new, slot, 0)

        # Rotate activations one hop down the ring (last→first is a bubble
        # feed that stage 0 overwrites on ingest).
        state = jax.lax.ppermute(y, axis_name, perm)
        return (state, out_buf), None

    (_, out_buf), _ = jax.lax.scan(
        tick, (state, out_buf), jnp.arange(T, dtype=jnp.int32)
    )
    # Broadcast the last stage's buffer to every device.
    out_buf = jnp.where(s == S - 1, out_buf, jnp.zeros_like(out_buf))
    return jax.lax.psum(out_buf, axis_name)


def pipeline_forward(
    mesh: Mesh,
    stacked_layers: Any,
    x: jax.Array,
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    axis_name: str = "stage",
    n_microbatches: int = 4,
) -> jax.Array:
    """Pipeline-parallel forward of depth-stacked layers over ``axis_name``.

    ``stacked_layers``: pytree with a leading layer axis L (every leaf),
    L divisible by the stage count; device s holds layers
    ``[s*L/S, (s+1)*L/S)``. ``x``: (B, ...) with B divisible by
    ``n_microbatches``. ``layer_fn(layer_params, h) -> h`` applies ONE layer.
    """
    S = mesh.shape[axis_name]
    B = x.shape[0]
    if B % n_microbatches != 0:
        raise ValueError(f"batch {B} not divisible by {n_microbatches} microbatches")
    L = jax.tree.leaves(stacked_layers)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"{L} layers not divisible by {S} stages")

    def stage_fn(stage_layers, h):
        def body(h, layer):
            return layer_fn(layer, h), None

        h, _ = jax.lax.scan(body, h, stage_layers)
        return h

    xm = x.reshape(n_microbatches, B // n_microbatches, *x.shape[1:])
    inner = shard_map(
        functools.partial(
            pipeline_stage_loop, stage_fn=stage_fn, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_rep=False,
    )
    out = inner(stacked_layers, xm)
    return out.reshape(B, *out.shape[2:])
