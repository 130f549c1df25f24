"""Decode-step KV append kernel: oracle semantics + interpret-mode parity.

# GIVEN an int8 KV cache and one new token per sequence at per-sequence
# offsets, # WHEN appending via the Pallas kernel (interpret mode on CPU),
# # THEN the result matches the masked-select oracle exactly.
"""

import jax
import jax.numpy as jnp
import pytest

from fastforward_tpu.kernels.kv_update import (
    kv_append_decode_int8,
    kv_append_decode_reference,
)


def _mk(key, B=4, Hkv=8, S=256, D=128):
    ks_ = jax.random.split(key, 9)
    kc = jax.random.randint(ks_[0], (B, Hkv, S, D), -128, 128, dtype=jnp.int8)
    vc = jax.random.randint(ks_[1], (B, Hkv, S, D), -128, 128, dtype=jnp.int8)
    ks = jax.random.uniform(ks_[2], (B, Hkv, S))
    vs = jax.random.uniform(ks_[3], (B, Hkv, S))
    kn = jax.random.randint(ks_[4], (B, Hkv, 1, D), -128, 128, dtype=jnp.int8)
    vn = jax.random.randint(ks_[5], (B, Hkv, 1, D), -128, 128, dtype=jnp.int8)
    ksn = jax.random.uniform(ks_[6], (B, Hkv, 1))
    vsn = jax.random.uniform(ks_[7], (B, Hkv, 1))
    starts = jax.random.randint(ks_[8], (B,), 0, S, dtype=jnp.int32)
    return kc, vc, ks, vs, kn, vn, ksn, vsn, starts


def test_reference_writes_exactly_one_row():
    # GIVEN a zero cache
    B, Hkv, S, D = 2, 4, 64, 128
    kc = jnp.zeros((B, Hkv, S, D), jnp.int8)
    vc = jnp.zeros((B, Hkv, S, D), jnp.int8)
    ks = jnp.zeros((B, Hkv, S))
    vs = jnp.zeros((B, Hkv, S))
    kn = jnp.ones((B, Hkv, 1, D), jnp.int8)
    vn = 2 * jnp.ones((B, Hkv, 1, D), jnp.int8)
    ksn = jnp.full((B, Hkv, 1), 0.5)
    vsn = jnp.full((B, Hkv, 1), 0.25)
    starts = jnp.array([3, 60], jnp.int32)
    # WHEN appending
    kc2, vc2, ks2, vs2 = kv_append_decode_reference(
        kc, vc, ks, vs, kn, vn, ksn, vsn, starts
    )
    # THEN exactly the start row per sequence is written
    for b, s in enumerate([3, 60]):
        assert bool(jnp.all(kc2[b, :, s] == 1))
        assert bool(jnp.all(vc2[b, :, s] == 2))
        assert float(jnp.sum(ks2[b])) == pytest.approx(0.5 * Hkv)
        assert float(jnp.sum(vs2[b])) == pytest.approx(0.25 * Hkv)
    assert int(jnp.sum(jnp.abs(kc2.astype(jnp.int32)))) == B * Hkv * D


@pytest.mark.parametrize("S", [256, 384])
def test_kernel_interpret_matches_reference(S):
    # GIVEN random cache state and offsets
    args = _mk(jax.random.PRNGKey(0), S=S)
    # WHEN running the Pallas kernel in interpret mode
    out = kv_append_decode_int8(*args, interpret=True)
    # THEN it matches the oracle bit-exactly
    ref = kv_append_decode_reference(*args)
    for a, b in zip(out, ref):
        assert a.dtype == b.dtype or a.dtype == jnp.float32
        assert bool(jnp.all(a == b))


def test_hostile_shapes_fall_back():
    # GIVEN a cache whose S is not tile-divisible
    args = _mk(jax.random.PRNGKey(1), S=100, D=128)
    # WHEN appending # THEN the XLA fallback handles it (no error)
    out = kv_append_decode_int8(*args)
    ref = kv_append_decode_reference(*args)
    for a, b in zip(out, ref):
        assert bool(jnp.all(a == b))


def test_stacked_kernel_interpret_matches_reference():
    # GIVEN a stacked (L, ...) cache, random offsets, and a layer index
    from fastforward_tpu.kernels.kv_update import (
        kv_append_decode_int8_stacked,
        kv_append_decode_stacked_reference,
    )

    L = 3
    key = jax.random.PRNGKey(2)
    ks_ = jax.random.split(key, 10)
    B, Hkv, S, D = 4, 8, 256, 128
    kc = jax.random.randint(ks_[0], (L, B, Hkv, S, D), -128, 128, dtype=jnp.int8)
    vc = jax.random.randint(ks_[1], (L, B, Hkv, S, D), -128, 128, dtype=jnp.int8)
    ks = jax.random.uniform(ks_[2], (L, B, Hkv, S))
    vs = jax.random.uniform(ks_[3], (L, B, Hkv, S))
    kn = jax.random.randint(ks_[4], (B, Hkv, 1, D), -128, 128, dtype=jnp.int8)
    vn = jax.random.randint(ks_[5], (B, Hkv, 1, D), -128, 128, dtype=jnp.int8)
    ksn = jax.random.uniform(ks_[6], (B, Hkv, 1))
    vsn = jax.random.uniform(ks_[7], (B, Hkv, 1))
    starts = jax.random.randint(ks_[8], (B,), 0, S, dtype=jnp.int32)
    for layer in (0, L - 1):
        l = jnp.asarray(layer, jnp.int32)
        # WHEN appending via the layer-indexed kernel (interpret mode)
        out = kv_append_decode_int8_stacked(
            kc, vc, ks, vs, kn, vn, ksn, vsn, starts, l, interpret=True
        )
        # THEN it matches the stacked oracle exactly (other layers untouched)
        ref = kv_append_decode_stacked_reference(
            kc, vc, ks, vs, kn, vn, ksn, vsn, starts, l
        )
        for a, b in zip(out, ref):
            assert bool(jnp.all(a == b.astype(a.dtype)))
