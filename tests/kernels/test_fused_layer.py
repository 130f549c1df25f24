"""Fused o+MLP layer-tail kernel: CPU oracle + serving integration tests.
Real-TPU kernel correctness: scripts/tpu_probe_fused.py (same oracle)."""


import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels import pack_int4, quantize_rowwise
from fastforward_tpu.kernels.matmul import (
    convert_two_level,
    fused_o_mlp_reference,
    fused_o_mlp_stacked,
    matmul_w4a8_2l_reference,
)
from fastforward_tpu.kernels.packing import pack_mult_nibbles


def _two_level(rng, K, N, g=128):
    w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 2e-2
    packed = pack_int4(jnp.asarray(w_q), group_size=g)
    return convert_two_level(packed, jnp.asarray(w_scale), g, paired=True)


def test_fused_reference_matches_composed_ops():
    rng = np.random.RandomState(0)
    M, H, INTER, g = 4, 256, 512, 128
    o = _two_level(rng, H, H, g)
    gu = _two_level(rng, H, 2 * INTER, g)
    dn = _two_level(rng, INTER, H, g)
    attn = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.3)
    x_res = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5)
    norm_w = jnp.asarray(rng.rand(H).astype(np.float32) + 0.5)

    out = fused_o_mlp_reference(
        attn, x_res, norm_w, o[0], o[1], o[2], gu[0], gu[1], gu[2],
        dn[0], dn[1], dn[2], group_size=g,
    )

    # independent composition with the public reference matmuls
    x_q, x_s = quantize_rowwise(attn)
    o_out = matmul_w4a8_2l_reference(x_q, x_s, *o, None, g, jnp.float32, paired=True)
    x1 = x_res + o_out
    inv = 1.0 / np.sqrt(np.mean(np.asarray(x1) ** 2, axis=1, keepdims=True) + 1e-5)
    h = jnp.asarray(np.asarray(x1) * inv) * norm_w[None, :]
    h_q, h_s = quantize_rowwise(h)
    guo = matmul_w4a8_2l_reference(h_q, h_s, *gu, None, g, jnp.float32, paired=True)
    guo = guo.astype(jnp.bfloat16).astype(jnp.float32)  # kernel's bf16 staging
    gate, up = guo[:, :INTER], guo[:, INTER:]
    gated = np.asarray(gate) / (1 + np.exp(-np.asarray(gate))) * np.asarray(up)
    g_q, g_s = quantize_rowwise(jnp.asarray(gated))
    dno = matmul_w4a8_2l_reference(g_q, g_s, *dn, None, g, jnp.float32, paired=True)
    ref = np.asarray(x1) + np.asarray(dno)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_fused_stacked_entry_cpu_dispatch():
    # CPU: the stacked entry dispatches to the per-layer reference.
    rng = np.random.RandomState(1)
    L, M, H, INTER, g = 3, 4, 256, 512, 128
    os_, gus, dns = [], [], []
    for _ in range(L):
        os_.append(_two_level(rng, H, H, g))
        gus.append(_two_level(rng, H, 2 * INTER, g))
        dns.append(_two_level(rng, INTER, H, g))

    def stack(items):
        w = jnp.stack([it[0] for it in items])
        mp = jnp.stack([pack_mult_nibbles(it[1]) for it in items])
        sc = jnp.stack([it[2] for it in items])
        return w, mp, sc

    o_w, o_mp, o_sc = stack(os_)
    gu_w, gu_mp, gu_sc = stack(gus)
    dn_w, dn_mp, dn_sc = stack(dns)
    norm_w = jnp.asarray(rng.rand(L, H).astype(np.float32) + 0.5)
    attn = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.3)
    x_res = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5)

    for l in range(L):
        out = fused_o_mlp_stacked(
            attn, x_res, norm_w,
            o_w, o_mp, o_sc, gu_w, gu_mp, gu_sc, dn_w, dn_mp, dn_sc,
            jnp.asarray(l, jnp.int32), group_size=g,
        )
        ref = fused_o_mlp_reference(
            attn, x_res, norm_w[l], os_[l][0], os_[l][1], os_[l][2],
            gus[l][0], gus[l][1], gus[l][2], dns[l][0], dns[l][1], dns[l][2],
            group_size=g,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
        )


def test_serving_fused_layer_knob_equivalence(monkeypatch):
    # The stacked decode step with FF_FUSED_LAYER on vs off must agree
    # (CPU: both run reference math; fused keeps the chain in f32, so
    # compare loosely in the quantized-noise class).
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_seq_len=64,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)
    assert stacked.o_proj.paired

    def run():
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=2, max_len=16,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 1)))
        # force the fused-eligible path off-TPU for the knob comparison
        monkeypatch.setenv("FF_KV_STACKED", "force")
        logits, _ = serving_forward_stacked(params, stacked, config, ids, cache)
        return np.asarray(logits)

    monkeypatch.setenv("FF_FUSED_LAYER", "0")
    base = run()
    monkeypatch.setenv("FF_FUSED_LAYER", "1")
    fused = run()
    # CPU dispatch of the fused path requires _on_tpu() — both runs take the
    # unfused path here, so this guards the wiring doesn't corrupt anything.
    np.testing.assert_allclose(base, fused, rtol=1e-5, atol=1e-5)


def test_fused_norm_qkv_reference_matches_composed_ops():
    from fastforward_tpu.kernels.matmul import fused_norm_qkv_reference

    rng = np.random.RandomState(2)
    M, H, N, g = 4, 256, 384, 128
    qkv = _two_level(rng, H, N, g)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5)
    norm_w = jnp.asarray(rng.rand(H).astype(np.float32) + 0.5)

    out = fused_norm_qkv_reference(x, norm_w, *qkv, group_size=g)

    inv = 1.0 / np.sqrt(np.mean(np.asarray(x) ** 2, axis=1, keepdims=True) + 1e-5)
    h = jnp.asarray(np.asarray(x) * inv) * norm_w[None, :]
    h_q, h_s = quantize_rowwise(h)
    ref = matmul_w4a8_2l_reference(h_q, h_s, *qkv, None, g, jnp.float32, paired=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fused_norm_qkv_stacked_entry_cpu_dispatch():
    from fastforward_tpu.kernels.matmul import (
        fused_norm_qkv_reference,
        fused_norm_qkv_stacked,
    )

    rng = np.random.RandomState(3)
    L, M, H, N, g = 3, 4, 256, 384, 128
    per_layer = [_two_level(rng, H, N, g) for _ in range(L)]
    w = jnp.stack([p[0] for p in per_layer])
    mp = jnp.stack([pack_mult_nibbles(p[1]) for p in per_layer])
    sc = jnp.stack([p[2] for p in per_layer])
    norm_w = jnp.asarray(rng.rand(L, H).astype(np.float32) + 0.5)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5)

    for l in range(L):
        out = fused_norm_qkv_stacked(
            x, norm_w, w, mp, sc, jnp.asarray(l, jnp.int32), group_size=g,
            out_dtype=jnp.float32,
        )
        ref = fused_norm_qkv_reference(
            x, norm_w[l], per_layer[l][0], per_layer[l][1], per_layer[l][2],
            group_size=g,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
        )


def test_serving_fused_qkv_knob_equivalence(monkeypatch):
    # FF_FUSED_QKV on vs off through the stacked decode step (CPU: both runs
    # take the unfused path — guards the wiring, like the fused-layer knob).
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_seq_len=64,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=0)
    stacked = fuse_stacked_layers(stacked)

    def run():
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=2, max_len=16,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 1)))
        monkeypatch.setenv("FF_KV_STACKED", "force")
        logits, _ = serving_forward_stacked(params, stacked, config, ids, cache)
        return np.asarray(logits)

    monkeypatch.setenv("FF_FUSED_QKV", "0")
    base = run()
    monkeypatch.setenv("FF_FUSED_QKV", "1")
    fused = run()
    np.testing.assert_allclose(base, fused, rtol=1e-5, atol=1e-5)


def test_fused_norm_qkv_a4_reference_matches_unfused():
    """A4 layer-head oracle == rmsnorm -> quantize_rowwise_a4 -> A4 GEMV."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastforward_tpu.kernels.matmul import (
        fused_norm_qkv_a4_reference,
        matmul_w4a4_2l_reference,
        quantize_rowwise_a4,
    )

    rng = np.random.RandomState(0)
    M, K, N, g = 4, 256, 128, 128
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    nw = jnp.asarray(rng.rand(K).astype(np.float32) + 0.5)
    wp = jnp.asarray(rng.randint(-128, 128, (K // 2, N)), jnp.int8)
    m = jnp.asarray(rng.randint(1, 16, (K // g, N)), jnp.int8)
    sc = jnp.asarray(rng.rand(N).astype(np.float32) * 0.01)

    got = np.asarray(fused_norm_qkv_a4_reference(x, nw, wp, m, sc, g))
    xf = np.asarray(x, np.float32)
    inv = 1.0 / np.sqrt((xf ** 2).mean(1, keepdims=True) + 1e-5)
    h = xf * inv * np.asarray(nw)[None, :]
    h_q, h_s = quantize_rowwise_a4(jnp.asarray(h))
    want = np.asarray(matmul_w4a4_2l_reference(
        h_q, h_s, wp, m, sc, group_size=g, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
