"""INT8-KV flash-decode attention: reference vs dense oracle."""

import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.attention import flash_decode_int8_reference


def _dense_oracle(q, kf, vf, lengths):
    B, H, d = q.shape
    S = kf.shape[2]
    groups = H // kf.shape[1]
    kfe = np.repeat(kf, groups, axis=1)
    vfe = np.repeat(vf, groups, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, kfe) / np.sqrt(d)
    mask = np.arange(S)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -1e30)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhs,bhsd->bhd", w, vfe)


def _setup(B=2, H=8, Hkv=2, S=64, d=32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, d).astype(np.float32)
    k8 = rng.randint(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    v8 = rng.randint(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([S, S // 2], np.int32)[:B]
    return q, k8, ks, v8, vs, lengths


def test_reference_matches_dense_oracle():
    q, k8, ks, v8, vs, lengths = _setup()
    out = flash_decode_int8_reference(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(lengths),
    )
    kf = k8.astype(np.float32) * ks[..., None]
    vf = v8.astype(np.float32) * vs[..., None]
    oracle = _dense_oracle(q, kf, vf, lengths)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_length_masking_ignores_tail():
    q, k8, ks, v8, vs, lengths = _setup(B=1)
    lengths = np.array([10], np.int32)
    out_a = flash_decode_int8_reference(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(lengths),
    )
    # scribble on the masked tail — output must not change
    k8_b = k8.copy(); k8_b[:, :, 10:] = 42
    v8_b = v8.copy(); v8_b[:, :, 10:] = -13
    out_b = flash_decode_int8_reference(
        jnp.asarray(q), jnp.asarray(k8_b), jnp.asarray(ks),
        jnp.asarray(v8_b), jnp.asarray(vs), jnp.asarray(lengths),
    )
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
