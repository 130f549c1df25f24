"""Quantized MoE block: routing correctness and expert-parallel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.parallel import make_mesh
from fastforward_tpu.serving import expert_parallel_moe, make_moe_block, moe_forward


def test_moe_routes_topk_and_runs_quantized_experts():
    # GIVEN a quantized MoE block
    block = make_moe_block(
        jax.random.PRNGKey(0), hidden=64, intermediate=128,
        num_experts=4, mode="w8a8", top_k=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 64), jnp.float32)
    # WHEN running the forward
    out = moe_forward(x, block, out_dtype=jnp.float32)
    # THEN shape is preserved and the output is a convex expert combination
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))

    # AND it equals the manual dense-masked computation
    logits = x @ block.router.astype(jnp.float32)
    tv, ti = jax.lax.top_k(logits, 2)
    tw = jax.nn.softmax(tv, axis=-1)
    from fastforward_tpu.serving.moe import _expert_slice

    expected = jnp.zeros_like(out)
    for e in range(4):
        gu = _expert_slice(block.gate_up, e)(x, out_dtype=jnp.bfloat16)
        inter = gu.shape[-1] // 2
        y = _expert_slice(block.down, e)(
            (jax.nn.silu(gu[..., :inter].astype(jnp.float32))
             * gu[..., inter:].astype(jnp.float32)).astype(jnp.bfloat16),
            out_dtype=jnp.float32,
        )
        w_tok = jnp.sum(jnp.where(ti == e, tw, 0.0), axis=-1)
        expected = expected + y * w_tok[:, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4)


@pytest.mark.multi_device
def test_expert_parallel_matches_single_device():
    # GIVEN a block with 8 experts and a 4-way expert-parallel mesh
    block = make_moe_block(
        jax.random.PRNGKey(2), hidden=64, intermediate=128,
        num_experts=8, mode="w4a8_2l", group_size=64, top_k=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 64), jnp.bfloat16)
    ref = moe_forward(x, block, out_dtype=jnp.float32)
    mesh = make_mesh({"expert": 4}, devices=jax.devices()[:4])
    # WHEN sharding experts over the mesh
    out = expert_parallel_moe(mesh, block, x)
    # THEN the psum-combined result matches the unsharded forward
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_moe_block_quantized_storage_is_low_bit():
    block = make_moe_block(
        jax.random.PRNGKey(4), hidden=64, intermediate=128,
        num_experts=2, mode="w4a8_2l", group_size=64,
    )
    # packed int4: (E, K//2, N)
    assert block.gate_up.data.dtype == jnp.int8
    assert block.gate_up.data.shape == (2, 32, 256)
    assert block.gate_up.mult is not None
