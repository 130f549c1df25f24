"""Context (sequence) parallelism: ring attention over a mesh axis.

New TPU capability — SURVEY §5 "long-context / sequence parallelism": the
reference has none (its only attention code is the quantized SDPA math,
`nn/functional/custom/sdpa.py:93-265`); on TPU long-context prefill shards
the sequence over the mesh and streams K/V blocks around the ICI ring with
`jax.lax.ppermute`, merging partial attention with the numerically stable
online-softmax rule (flash-attention accumulation across devices).

Usage (inside `shard_map` with q/k/v sharded along the sequence axis):

    out = ring_attention(q, k, v, axis_name="sp", causal=True)

or let :func:`context_parallel_attention` build the shard_map wrapper.
Communication volume per device is `(steps-1) * local_kv_bytes`, fully
overlappable with the per-block attention compute by XLA's latency-hiding
scheduler (the ppermute for step i+1 is independent of step i's FLOPs).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _block_attend(q, k, v, q_pos, kv_pos, causal, scale):
    """Partial attention of local q against one K/V block.

    Returns (m, l, o): running max (B,H,Tq,1), sum of exp (B,H,Tq,1), and
    unnormalized output (B,H,Tq,D) — the flash-attention partial state.
    """
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        mask = kv_pos[None, :] <= q_pos[:, None]  # (Tq, Ts)
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)  # (B,H,Tq,1)
    # Guard fully-masked rows (all -inf): exp(NEG_INF - NEG_INF) would be 1.
    safe_m = jnp.maximum(m, NEG_INF / 2)
    p = jnp.exp(scores - safe_m)
    p = jnp.where(m <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhts,bhsd->bhtd", p.astype(v.dtype), v).astype(jnp.float32)
    return m, l, o


def _merge(state, new):
    m0, l0, o0 = state
    m1, l1, o1 = new
    m = jnp.maximum(m0, m1)
    a0 = jnp.exp(m0 - m)
    a1 = jnp.exp(m1 - m)
    return m, l0 * a0 + l1 * a1, o0 * a0 + o1 * a1


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Ring attention on sequence-sharded (B, H, T_local, D) q/k/v.

    Must run inside `shard_map` (or `jax.jit` with explicit collectives
    allowed): each of the `steps = axis_size` iterations attends local q to
    the currently-held K/V block, then rotates K/V one hop around the ring.
    Assumes the global sequence is laid out contiguously across the axis
    (device i holds positions [i*T_local, (i+1)*T_local)).
    """
    steps = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, T, D = q.shape
    scale = scale if scale is not None else 1.0 / np.sqrt(D)

    q_pos = idx * T + jnp.arange(T)

    def body(carry, _):
        (k_blk, v_blk, src, state) = carry
        kv_pos = src * T + jnp.arange(T)
        new = _block_attend(q, k_blk, v_blk, q_pos, kv_pos, causal, scale)
        state = _merge(state, new)
        perm = [(i, (i + 1) % steps) for i in range(steps)]
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        src_nxt = jax.lax.ppermute(src, axis_name, perm)
        return (k_nxt, v_nxt, src_nxt, state), None

    init_state = (
        jnp.full((B, H, T, 1), NEG_INF, jnp.float32),
        jnp.zeros((B, H, T, 1), jnp.float32),
        jnp.zeros((B, H, T, D), jnp.float32),
    )
    (_, _, _, (m, l, o)), _ = jax.lax.scan(
        body, (k, v, idx, init_state), None, length=steps
    )
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def context_parallel_attention(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    causal: bool = True,
) -> jax.Array:
    """shard_map wrapper: shards (B, H, T, D) q/k/v along T over ``axis_name``
    and runs :func:`ring_attention`. T must divide by the axis size."""
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
