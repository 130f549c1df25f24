"""Paged KV kernels: page-gather semantics, paged-vs-contiguous attention
oracle parity, and interpret-mode append parity. Real-TPU correctness:
scripts/tpu_probe_paged.py (same oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.kernels.attention import flash_decode_int8_reference
from fastforward_tpu.kernels.paged_attention import (
    gather_pages,
    paged_flash_decode_reference,
    paged_kv_append_decode_int8,
    paged_kv_append_reference,
)


def _pool_setup(rng, L=2, P=12, Hkv=2, page=128, d=128, B=3, MP=3):
    k_pool = jnp.asarray(rng.randint(-127, 128, (L, P, Hkv, page, d)), jnp.int8)
    v_pool = jnp.asarray(rng.randint(-127, 128, (L, P, Hkv, page, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, P, Hkv, page).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, P, Hkv, page).astype(np.float32) * 0.02 + 0.01)
    # distinct pages per sequence, shuffled physical order
    perm = rng.permutation(P)[: B * MP].reshape(B, MP)
    table = jnp.asarray(perm, jnp.int32)
    return k_pool, v_pool, ks, vs, table


def test_gather_pages_layout():
    rng = np.random.RandomState(0)
    P, Hkv, page, d = 4, 2, 8, 4
    pool = jnp.asarray(rng.randn(P, Hkv, page, d).astype(np.float32))
    table_row = jnp.asarray([2, 0, 3], jnp.int32)
    out = gather_pages(pool, table_row)
    assert out.shape == (Hkv, 3 * page, d)
    np.testing.assert_array_equal(
        np.asarray(out[:, page : 2 * page]), np.asarray(pool[0])
    )


def test_paged_attention_matches_contiguous():
    # GIVEN pages scattered through the pool WHEN attending through the
    # page table THEN the result equals contiguous-cache flash decode.
    rng = np.random.RandomState(1)
    L, P, Hkv, page, d, B, MP = 2, 12, 2, 128, 128, 3, 3
    k_pool, v_pool, ks, vs, table = _pool_setup(rng, L, P, Hkv, page, d, B, MP)
    H = Hkv * 4
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3)
    lengths = jnp.asarray([5, 140, 3 * page], jnp.int32)

    for layer in range(L):
        out = paged_flash_decode_reference(
            q, k_pool[layer], ks[layer], v_pool[layer], vs[layer],
            table, lengths,
        )
        # contiguous equivalent: gather each row's pages
        k = jnp.stack([gather_pages(k_pool[layer], table[b]) for b in range(B)])
        ksc = jnp.stack([gather_pages(ks[layer], table[b]) for b in range(B)])
        v = jnp.stack([gather_pages(v_pool[layer], table[b]) for b in range(B)])
        vsc = jnp.stack([gather_pages(vs[layer], table[b]) for b in range(B)])
        ref = flash_decode_int8_reference(q, k, ksc, v, vsc, lengths)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("pos", [0, 1, 127, 128, 255, 300])
def test_paged_append_reference_semantics(pos):
    rng = np.random.RandomState(2)
    L, P, Hkv, page, d, B, MP = 2, 12, 2, 128, 128, 2, 3
    k_pool, v_pool, ks, vs, table = _pool_setup(rng, L, P, Hkv, page, d, B, MP)
    positions = jnp.asarray([pos, (pos + 17) % (MP * page)], jnp.int32)
    k_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    ks_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    vs_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    layer = jnp.asarray(1, jnp.int32)

    k2, v2, ks2, vs2 = paged_kv_append_reference(
        k_pool, v_pool, ks, vs, k_new, v_new, ks_new, vs_new,
        positions, table, layer,
    )
    for b in range(B):
        p = int(positions[b])
        pid = int(table[b, p // page])
        off = p % page
        np.testing.assert_array_equal(
            np.asarray(k2[1, pid, :, off, :]), np.asarray(k_new[b, :, 0, :])
        )
        np.testing.assert_allclose(
            np.asarray(ks2[1, pid, :, off]), np.asarray(ks_new[b, :, 0])
        )
    # layer 0 untouched
    np.testing.assert_array_equal(np.asarray(k2[0]), np.asarray(k_pool[0]))


def test_paged_append_kernel_interpret_matches_reference():
    rng = np.random.RandomState(3)
    L, P, Hkv, page, d, B, MP = 2, 12, 2, 128, 128, 3, 3
    k_pool, v_pool, ks, vs, table = _pool_setup(rng, L, P, Hkv, page, d, B, MP)
    positions = jnp.asarray([0, 130, 383], jnp.int32)
    k_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    ks_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    vs_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    layer = jnp.asarray(0, jnp.int32)

    ref = paged_kv_append_reference(
        k_pool, v_pool, ks, vs, k_new, v_new, ks_new, vs_new,
        positions, table, layer,
    )
    out = paged_kv_append_decode_int8(
        k_pool, v_pool, ks, vs, k_new, v_new, ks_new, vs_new,
        positions, table, layer, interpret=True,
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
