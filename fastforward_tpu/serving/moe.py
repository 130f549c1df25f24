"""Quantized Mixture-of-Experts block with expert parallelism.

New TPU capability (SURVEY §2.9 — the reference has no MoE and no
parallelism). Experts are SwiGLU MLPs whose weights live in frozen low-bit
`QuantLinear` storage stacked along a leading expert axis; under expert
parallelism that axis is sharded over a mesh axis (each device holds
``E / ep`` experts) and the routed combine is a single `psum`.

Routing is dense-masked: every device computes its local experts over all
tokens and masks by the router's top-k choice. For the decode shapes this
framework targets (small token counts, large experts) the masked compute is
MXU-friendly and avoids a data-dependent all_to_all; a capacity-based
all_to_all dispatch is the documented upgrade path for long-prefill MoE.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fastforward_tpu.serving.engine import QuantLinear, quantize_linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MoEBlock:
    """Router + E stacked quantized SwiGLU experts.

    ``gate_up``/``down`` are `QuantLinear`s whose arrays carry a leading
    expert axis (E, ...); ``router`` is (hidden, E) bf16 (router stays in
    bf16 — it is tiny and precision-critical).
    """

    router: jax.Array
    gate_up: QuantLinear
    down: QuantLinear
    top_k: int = dataclasses.field(metadata=dict(static=True), default=2)

    @property
    def num_experts(self) -> int:
        return self.router.shape[-1]


def make_moe_block(
    key: jax.Array,
    hidden: int,
    intermediate: int,
    num_experts: int,
    mode: str = "w4a8_2l",
    group_size: int = 128,
    top_k: int = 2,
) -> MoEBlock:
    """Random-init MoE block with frozen quantized experts (tests/bench)."""
    kr, kg, kd = jax.random.split(key, 3)
    router = jax.random.normal(kr, (hidden, num_experts), jnp.bfloat16) * 0.02

    def stack_ql(key, K, N):
        qls = [
            quantize_linear(
                jax.random.normal(jax.random.fold_in(key, e), (K, N), jnp.float32)
                / jnp.sqrt(K),
                mode, group_size if K % group_size == 0 else K,
            )
            for e in range(num_experts)
        ]
        first = qls[0]
        return QuantLinear(
            data=jnp.stack([q.data for q in qls]),
            scale=jnp.stack([q.scale for q in qls]),
            mode=first.mode,
            group_size=first.group_size,
            mult=None if first.mult is None else jnp.stack([q.mult for q in qls]),
            paired=first.paired,
        )

    return MoEBlock(
        router=router,
        gate_up=stack_ql(kg, hidden, 2 * intermediate),
        down=stack_ql(kd, intermediate, hidden),
        top_k=top_k,
    )


def _expert_slice(ql: QuantLinear, e: int) -> QuantLinear:
    return QuantLinear(
        data=ql.data[e],
        scale=ql.scale[e],
        mode=ql.mode,
        group_size=ql.group_size,
        mult=None if ql.mult is None else ql.mult[e],
        paired=ql.paired,
    )


def moe_forward(
    x: jax.Array,
    block: MoEBlock,
    ep_axis: Optional[str] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Top-k routed forward. x: (..., hidden) → (..., hidden).

    ``ep_axis``: when running inside `shard_map` with the expert axis of
    ``block`` sharded over that mesh axis, local expert outputs are combined
    with a `psum`; routing probabilities are computed over the *global*
    expert count (the router weight is replicated).
    """
    lead = x.shape[:-1]
    H = x.shape[-1]
    xt = x.reshape(-1, H)

    logits = (xt.astype(jnp.float32) @ block.router.astype(jnp.float32))
    E_global = logits.shape[-1]
    top_vals, top_idx = jax.lax.top_k(logits, block.top_k)
    top_w = jax.nn.softmax(top_vals, axis=-1)  # (tokens, k)

    E_local = block.gate_up.data.shape[0]
    if ep_axis is not None:
        offset = jax.lax.axis_index(ep_axis) * E_local
    else:
        offset = 0
        assert E_local == E_global

    acc = jnp.zeros((xt.shape[0], H), jnp.float32)
    for e in range(E_local):
        ge = offset + e
        gate_up = _expert_slice(block.gate_up, e)(xt, out_dtype=jnp.bfloat16)
        inter = gate_up.shape[-1] // 2
        gated = jax.nn.silu(gate_up[..., :inter].astype(jnp.float32))
        y = _expert_slice(block.down, e)(
            (gated * gate_up[..., inter:].astype(jnp.float32)).astype(jnp.bfloat16),
            out_dtype=jnp.float32,
        )
        w_tok = jnp.sum(jnp.where(top_idx == ge, top_w, 0.0), axis=-1)  # (tokens,)
        acc = acc + y * w_tok[:, None]

    if ep_axis is not None:
        acc = jax.lax.psum(acc, ep_axis)
    return acc.astype(out_dtype).reshape(*lead, H)


def expert_parallel_moe(mesh, block: MoEBlock, x: jax.Array, axis_name: str = "expert"):
    """shard_map wrapper: experts sharded over ``axis_name``, tokens and
    router replicated, outputs replicated (psum-combined)."""
    import functools

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ep_spec = MoEBlock(
        router=P(),
        gate_up=QuantLinear(
            data=P(axis_name), scale=P(axis_name),
            mode=block.gate_up.mode, group_size=block.gate_up.group_size,
            mult=None if block.gate_up.mult is None else P(axis_name),
            paired=block.gate_up.paired,
        ),
        down=QuantLinear(
            data=P(axis_name), scale=P(axis_name),
            mode=block.down.mode, group_size=block.down.group_size,
            mult=None if block.down.mult is None else P(axis_name),
            paired=block.down.paired,
        ),
        top_k=block.top_k,
    )
    fn = shard_map(
        functools.partial(moe_forward, ep_axis=axis_name),
        mesh=mesh,
        in_specs=(P(), ep_spec),
        out_specs=P(),
        check_rep=False,
    )
    return fn(x, block)
