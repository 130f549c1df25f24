"""Native C++ quantize/pack kernels vs the numpy reference."""

import numpy as np

from fastforward_tpu import native
from fastforward_tpu.kernels.packing import unpack_int4
import jax.numpy as jnp


def test_native_builds():
    assert native.native_available(), "native library failed to build"


def test_quantize_pack_int4_matches_numpy():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 64).astype(np.float32)
    packed_c, scales_c = native.quantize_pack_int4(w, group_size=128)
    packed_np, scales_np = native._quantize_pack_int4_numpy(w, 128)
    np.testing.assert_allclose(scales_c, scales_np, rtol=1e-6)
    # rounding at .5 boundaries can differ (lround vs round-half-even);
    # require near-exact agreement
    q_c = np.asarray(unpack_int4(jnp.asarray(packed_c), 128))
    q_np = np.asarray(unpack_int4(jnp.asarray(packed_np), 128))
    mismatch = (q_c != q_np).mean()
    assert mismatch < 0.01
    np.testing.assert_array_equal(np.abs(q_c - q_np) <= 1, True)


def test_quantize_pack_int4_dequant_error():
    rng = np.random.RandomState(1)
    w = rng.randn(256, 32).astype(np.float32)
    packed, scales = native.quantize_pack_int4(w, group_size=128)
    q = np.asarray(unpack_int4(jnp.asarray(packed), 128), dtype=np.float32)
    dq = q.reshape(2, 128, 32) * scales[:, None, :]
    err = np.abs(dq.reshape(256, 32) - w)
    assert (err <= scales.repeat(128, axis=0) / 2 + 1e-6).all()


def test_quantize_int8_matches_numpy():
    rng = np.random.RandomState(2)
    w = rng.randn(128, 64).astype(np.float32)
    q_c, s_c = native.quantize_int8(w)
    s_np = np.abs(w).max(axis=0) / 127.0
    np.testing.assert_allclose(s_c, s_np, rtol=1e-6)
    q_np = np.clip(np.round(w / s_np[None, :]), -128, 127)
    assert (np.abs(q_c.astype(np.int32) - q_np.astype(np.int32)) <= 1).all()


def test_bf16_input():
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    w32 = rng.randn(128, 32).astype(np.float32)
    w16 = np.asarray(jnp.asarray(w32, dtype=jnp.bfloat16))
    packed, scales = native.quantize_pack_int4(w16, group_size=128)
    assert packed.shape == (64, 32)
    # dequantized result close to the f32 original
    q = np.asarray(unpack_int4(jnp.asarray(packed), 128), dtype=np.float32)
    dq = q * scales.repeat(128, axis=0)
    assert np.abs(dq - w32).max() < np.abs(w32).max() * 0.15
