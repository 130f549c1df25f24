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


def test_flash_decode_ragged_cpu_fallback_matches_reference():
    # CPU: the ragged entry dispatches to the same reference oracle.
    import jax.numpy as jnp

    from fastforward_tpu.kernels.attention import (
        flash_decode_int8_reference,
        flash_decode_int8_stacked_ragged,
    )

    rng = np.random.RandomState(0)
    L, B, H, Hkv, S, d = 2, 3, 8, 2, 512, 128
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    lengths = jnp.asarray([1, 160, 512], jnp.int32)
    for layer in range(L):
        out = flash_decode_int8_stacked_ragged(
            q, k, ks, v, vs, lengths, jnp.asarray(layer, jnp.int32)
        )
        ref = flash_decode_int8_reference(
            q, k[layer], ks[layer], v[layer], vs[layer], lengths
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


def test_serving_ragged_knob_wiring(monkeypatch):
    # FF_FLASH_RAGGED forced on vs off through the stacked decode step on
    # CPU (both dispatch to reference math — guards the routing).
    import jax.numpy as jnp

    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_seq_len=64,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)

    def run():
        cache = StackedKVCache.create(
            num_layers=2, batch_size=2, max_len=16,
            num_kv_heads=2, head_dim=64, quantized=True,
        )
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 1)))
        monkeypatch.setenv("FF_KV_STACKED", "force")
        logits, _ = serving_forward_stacked(params, stacked, config, ids, cache)
        return np.asarray(logits)

    monkeypatch.setenv("FF_FLASH_RAGGED", "0")
    base = run()
    monkeypatch.setenv("FF_FLASH_RAGGED", "1")
    ragged = run()
    np.testing.assert_allclose(base, ragged, rtol=1e-5, atol=1e-5)


def test_flash_decode_s_blocks_cpu_matches_reference():
    # s_blocks limits the TPU grid to a block prefix; on CPU the entry
    # dispatches to the reference oracle — equality holds whenever every
    # length fits inside the requested prefix (the caller's contract).
    import jax.numpy as jnp

    from fastforward_tpu.kernels.attention import (
        flash_decode_int8_reference,
        flash_decode_int8_stacked,
    )

    rng = np.random.RandomState(1)
    L, B, H, Hkv, S, d = 2, 3, 8, 2, 512, 128
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    lengths = jnp.asarray([1, 160, 256], jnp.int32)
    out = flash_decode_int8_stacked(
        q, k, ks, v, vs, lengths, jnp.asarray(0, jnp.int32), s_blocks=1
    )
    ref = flash_decode_int8_reference(q, k[0], ks[0], v[0], vs[0], lengths)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_serving_bucketed_knob_wiring(monkeypatch):
    # FF_FLASH_BUCKETED forced on vs off through the stacked decode step on
    # a 512-slab CPU cache (both dispatch to reference math — guards the
    # lax.switch routing and bucket-index computation).
    import jax.numpy as jnp

    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_seq_len=512,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)

    def run():
        cache = StackedKVCache.create(
            num_layers=2, batch_size=2, max_len=512,
            num_kv_heads=2, head_dim=64, quantized=True,
        )
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 1)))
        monkeypatch.setenv("FF_KV_STACKED", "force")
        monkeypatch.setenv("FF_FLASH_RAGGED", "0")
        logits, _ = serving_forward_stacked(params, stacked, config, ids, cache)
        return np.asarray(logits)

    monkeypatch.setenv("FF_FLASH_BUCKETED", "0")
    base = run()
    monkeypatch.setenv("FF_FLASH_BUCKETED", "1")
    bucketed = run()
    np.testing.assert_allclose(base, bucketed, rtol=1e-5, atol=1e-5)
