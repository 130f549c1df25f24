"""Kernel numerics tests (reference implementations on CPU; the same
assertions run against the Pallas kernels on TPU via bench/verify)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.kernels import (
    matmul_w4a8_reference,
    matmul_w4a16_reference,
    matmul_w8a8_reference,
    pack_int4,
    quantize_rowwise,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randint(-8, 8, size=(256, 64)), dtype=jnp.int8)
    packed = pack_int4(w, group_size=128)
    assert packed.shape == (128, 64)
    restored = unpack_int4(packed, group_size=128)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(w))


def test_pack_rejects_bad_k():
    with pytest.raises(ValueError):
        pack_int4(jnp.zeros((100, 8), jnp.int8), group_size=128)


def test_quantize_rowwise():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    x_q, scale = quantize_rowwise(x)
    assert x_q.dtype == jnp.int8
    dq = np.asarray(x_q, dtype=np.float32) * np.asarray(scale)[:, None]
    np.testing.assert_allclose(dq, np.asarray(x), atol=np.asarray(scale).max() / 2 + 1e-6)
    # max magnitude maps to ±127
    assert np.abs(np.asarray(x_q)).max() == 127


def test_w8a8_matches_float_matmul():
    rng = np.random.RandomState(1)
    x = rng.randn(16, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32)

    x_q, x_scale = quantize_rowwise(jnp.asarray(x))
    # per-channel weight quant
    w_scale = np.abs(w).max(axis=0) / 127.0
    w_q = jnp.asarray(np.clip(np.round(w / w_scale[None, :]), -128, 127), dtype=jnp.int8)

    out = matmul_w8a8_reference(x_q, x_scale, w_q, jnp.asarray(w_scale), out_dtype=jnp.float32)
    expected = x @ w
    rel = np.abs(np.asarray(out) - expected) / (np.abs(expected).max())
    assert rel.max() < 0.02


def _quantize_w4_groups(w: np.ndarray, group_size=128):
    K, N = w.shape
    n_groups = K // group_size
    wg = w.reshape(n_groups, group_size, N)
    scale = np.abs(wg).max(axis=1) / 7.0 + 1e-12  # (g, N)
    q = np.clip(np.round(wg / scale[:, None, :]), -8, 7).astype(np.int8)
    return q.reshape(K, N), scale.astype(np.float32)


def _dequant_w4(w_q: np.ndarray, w_scale: np.ndarray, group_size=128) -> np.ndarray:
    K, N = w_q.shape
    wg = w_q.reshape(K // group_size, group_size, N).astype(np.float32)
    return (wg * w_scale[:, None, :]).reshape(K, N)


def test_w4a16_exact_vs_dequantized_oracle():
    # The kernel must match x @ dequant(w) exactly (same math, fused layout)
    rng = np.random.RandomState(2)
    x = rng.randn(8, 256).astype(np.float32)
    w = rng.randn(256, 64).astype(np.float32)
    w_q, w_scale = _quantize_w4_groups(w)
    packed = pack_int4(jnp.asarray(w_q), group_size=128)

    out = matmul_w4a16_reference(
        jnp.asarray(x), packed, jnp.asarray(w_scale), out_dtype=jnp.float32
    )
    oracle = x @ _dequant_w4(w_q, w_scale)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-4)
    # And stays within int4 noise of the true product
    rel = np.abs(np.asarray(out) - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.2


def test_w4a8_exact_vs_dequantized_oracle():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 256).astype(np.float32)
    w = rng.randn(256, 64).astype(np.float32)
    x_q, x_scale = quantize_rowwise(jnp.asarray(x))
    w_q, w_scale = _quantize_w4_groups(w)
    packed = pack_int4(jnp.asarray(w_q), group_size=128)

    out = matmul_w4a8_reference(
        x_q, x_scale, packed, jnp.asarray(w_scale), out_dtype=jnp.float32
    )
    x_dq = np.asarray(x_q, dtype=np.float32) * np.asarray(x_scale)[:, None]
    oracle = x_dq @ _dequant_w4(w_q, w_scale)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-4)
    rel = np.abs(np.asarray(out) - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.2


def test_two_level_conversion_and_oracle():
    # Two-level W4A8 (QServe-style): per-group scales constrained to integer
    # multiples of a per-column scale. Conversion must (a) stay within a
    # fraction of the intrinsic W4 quantization noise and (b) the integer
    # oracle must equal the dequantized-matmul formulation exactly.
    from fastforward_tpu.kernels import (
        convert_two_level,
        matmul_w4a8_2l_gemv,
        matmul_w4a8_2l_reference,
    )
    from fastforward_tpu.kernels.packing import unpack_uint4_offset_paired

    rng = np.random.RandomState(5)
    K, N, g = 512, 128, 128
    n_groups = K // g
    w = rng.randn(K, N).astype(np.float32)
    # widen group-scale variation to stress the multiplier grid
    w *= np.exp(rng.randn(n_groups, 1, 1) * 0.5).repeat(g, 1).reshape(K, 1)
    w_q, w_scale = _quantize_w4_groups(w, g)
    packed = pack_int4(jnp.asarray(w_q), group_size=g)

    p2, mult, s_col = convert_two_level(packed, jnp.asarray(w_scale), g)
    assert mult.dtype == jnp.int8
    assert 1 <= int(jnp.min(mult)) and int(jnp.max(mult)) <= 15

    # (a) representation error: small vs intrinsic quantization noise
    w_orig = _dequant_w4(w_q, w_scale, g)
    s_eff = np.asarray(mult, np.float32) * np.asarray(s_col)[None, :]
    # default at-rest layout for even group counts is the paired packing
    w_2l = _dequant_w4(np.asarray(unpack_uint4_offset_paired(p2, g)), s_eff, g)
    extra = ((w_2l - w_orig) ** 2).mean()
    quant_noise = ((w_orig - w) ** 2).mean()
    assert extra < 0.6 * quant_noise

    # (b) integer oracle == dequant matmul, and CPU entry point == oracle
    x = rng.randn(4, K).astype(np.float32)
    x_q, x_scale = quantize_rowwise(jnp.asarray(x))
    out = matmul_w4a8_2l_reference(
        x_q, x_scale, p2, mult, s_col, out_dtype=jnp.float32
    )
    x_dq = np.asarray(x_q, np.float32) * np.asarray(x_scale)[:, None]
    oracle = x_dq @ w_2l
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-4, atol=2e-4)
    out_entry = matmul_w4a8_2l_gemv(
        x_q, x_scale, p2, mult, s_col, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out_entry), np.asarray(out), rtol=1e-6)


def test_two_level_swar_byte_math():
    # The kernel's SWAR identity, checked in pure numpy int32 arithmetic:
    # packed bytes u=v+8, ((u*m) + (128-8m)) ^ 0x80 == int8 pattern of v*m.
    for v in range(-8, 8):
        for m in range(1, 16):
            u = v + 8
            t = (u * m + (128 - 8 * m)) ^ 0x80
            assert 0 <= u * m <= 225 and 0 <= t <= 255
            got = np.uint8(t).astype(np.int8)
            assert got == v * m, (v, m)


def test_quantlinear_two_level_mode():
    from fastforward_tpu.serving.engine import quantize_linear

    rng = np.random.RandomState(6)
    w = rng.randn(256, 64).astype(np.float32)
    ql = quantize_linear(jnp.asarray(w), "w4a8_2l", group_size=128)
    assert ql.mult is not None and ql.scale.shape == (64,)
    x = rng.randn(4, 256).astype(np.float32)
    out = ql(jnp.asarray(x), out_dtype=jnp.float32)
    rel = np.abs(np.asarray(out) - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.2  # within int4-noise of the float product


def test_w4a8_bias():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 128).astype(np.float32)
    w = rng.randn(128, 32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    x_q, x_scale = quantize_rowwise(jnp.asarray(x))
    w_q, w_scale = _quantize_w4_groups(w)
    packed = pack_int4(jnp.asarray(w_q), group_size=128)
    out = matmul_w4a8_reference(
        x_q, x_scale, packed, jnp.asarray(w_scale), bias=jnp.asarray(b),
        out_dtype=jnp.float32,
    )
    no_bias = matmul_w4a8_reference(
        x_q, x_scale, packed, jnp.asarray(w_scale), out_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out) - np.asarray(no_bias),
        np.broadcast_to(b[None, :], out.shape),
        atol=5e-3,
    )


def test_paired_packing_roundtrip_and_layout_equivalence():
    # GIVEN random int4 grid values with an even group count
    from fastforward_tpu.kernels.packing import (
        pack_uint4_offset_paired,
        unpack_uint4_offset_paired,
    )
    from fastforward_tpu.kernels import (
        convert_two_level,
        matmul_w4a8_2l_reference,
        quantize_rowwise,
    )

    rng = np.random.RandomState(7)
    K, N, g = 512, 128, 128
    v = rng.randint(-8, 8, (K, N)).astype(np.int8)
    # WHEN packing paired # THEN the roundtrip is exact
    packed = pack_uint4_offset_paired(jnp.asarray(v), g)
    assert packed.shape == (K // 2, N)
    np.testing.assert_array_equal(
        np.asarray(unpack_uint4_offset_paired(packed, g)), v
    )

    # AND the paired and unpaired at-rest layouts give the same matmul
    w_q, w_scale = _quantize_w4_groups(rng.randn(K, N).astype(np.float32), g)
    base = pack_int4(jnp.asarray(w_q), group_size=g)
    x = rng.randn(4, K).astype(np.float32)
    x_q, x_scale = quantize_rowwise(jnp.asarray(x))
    outs = []
    for paired in (False, True):
        p2, mult, s_col = convert_two_level(
            base, jnp.asarray(w_scale), g, paired=paired
        )
        outs.append(np.asarray(matmul_w4a8_2l_reference(
            x_q, x_scale, p2, mult, s_col, out_dtype=jnp.float32, paired=paired
        )))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_mult_nibble_packing_roundtrip():
    # GIVEN multipliers in [1, 15] with group counts that do and don't
    # divide 8
    from fastforward_tpu.kernels.packing import (
        pack_mult_nibbles,
        unpack_mult_nibbles,
    )

    rng = np.random.RandomState(9)
    for shape in [(112, 64), (3, 32, 16), (2, 12, 8)]:
        m = jnp.asarray(rng.randint(1, 16, shape), jnp.int8)
        # WHEN packing 8 groups per int32 # THEN the roundtrip is exact
        p = pack_mult_nibbles(m)
        assert p.shape[-2] == -(-shape[-2] // 8) and p.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(unpack_mult_nibbles(p, shape[-2])), np.asarray(m)
        )


def test_stacked_layer_indexed_gemv_matches_reference():
    # GIVEN a stack of per-layer two-level W4 weights
    from fastforward_tpu.kernels import (
        matmul_w4a8_2l_gemv_stacked,
        matmul_w4a8_2l_reference,
        quantize_rowwise,
    )
    from fastforward_tpu.kernels.packing import pack_mult_nibbles

    rng = np.random.RandomState(11)
    L, K, N, g = 3, 512, 256, 128
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int8)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 1e-2)
    x = rng.randn(4, K).astype(np.float32)
    x_q, x_scale = quantize_rowwise(jnp.asarray(x))

    # WHEN applying each layer through the layer-indexed entry point
    # THEN it matches the per-layer integer oracle exactly
    mp = pack_mult_nibbles(mult)
    for l in range(L):
        out = matmul_w4a8_2l_gemv_stacked(
            x_q, x_scale, wp, mp, s_col, jnp.asarray(l, jnp.int32),
            out_dtype=jnp.float32,
        )
        ref = matmul_w4a8_2l_reference(
            x_q, x_scale, wp[l], mult[l], s_col[l],
            out_dtype=jnp.float32, paired=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_stacked_paired_dequant_matches_per_layer():
    # GIVEN stacked paired two-level weights
    from fastforward_tpu.kernels.matmul import (
        dequantize_int4,
        dequantize_int4_paired_stacked,
    )

    rng = np.random.RandomState(13)
    L, K, N, g = 3, 512, 256, 128
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int32)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 1e-2)
    # WHEN dequantizing each layer via the layer-indexed stacked entry
    # THEN it matches the per-layer dequant with s_eff = mult * s_col
    for l in range(L):
        out = dequantize_int4_paired_stacked(
            wp, mult, s_col, jnp.asarray(l, jnp.int32), group_size=g
        )
        s_eff = mult[l].astype(jnp.float32) * s_col[l][None, :]
        ref = dequantize_int4(wp[l], s_eff, g, offset_binary=True, paired=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_paired_layout_survives_env_flip(monkeypatch):
    # GIVEN weights packed under the paired at-rest layout (recorded on the
    # QuantLinear), decode must be bit-exact even when the FF_2L_PAIRED env
    # default is flipped afterwards — layout is a property of the DATA, the
    # env knob only selects the default for *newly packed* weights.
    from fastforward_tpu.kernels import convert_two_level, matmul_w4a8_2l_reference
    from fastforward_tpu.serving.engine import QuantLinear

    rng = np.random.RandomState(7)
    K, N, g = 512, 128, 128
    w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 1e-2
    packed = pack_int4(jnp.asarray(w_q), group_size=g)
    p2, mult, s_col = convert_two_level(
        packed, jnp.asarray(w_scale), g, paired=True
    )
    ql = QuantLinear(p2, s_col, mode="w4a8_2l", group_size=g, mult=mult, paired=True)

    x = jnp.asarray(rng.randn(4, K).astype(np.float32) * 0.1)
    before = np.asarray(ql(x, out_dtype=jnp.float32))

    monkeypatch.setenv("FF_2L_PAIRED", "0")
    after = np.asarray(ql(x, out_dtype=jnp.float32))
    np.testing.assert_array_equal(before, after)

    # And the explicit-paired reference agrees regardless of the env.
    x_q, x_scale = quantize_rowwise(x)
    ref = matmul_w4a8_2l_reference(
        x_q, x_scale, p2, mult, s_col, group_size=g, out_dtype=jnp.float32,
        paired=True,
    )
    np.testing.assert_allclose(before, np.asarray(ref), rtol=1e-5, atol=1e-5)


def _two_level_head(rng, K, N, g):
    from fastforward_tpu.kernels import convert_two_level

    w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 1e-2
    packed = pack_int4(jnp.asarray(w_q), group_size=g)
    return convert_two_level(packed, jnp.asarray(w_scale), g, paired=True)


def test_gemv_argmax_fallback_matches_jnp_argmax():
    # CPU dispatch of the fused GEMV+argmax head: falls back to the XLA
    # reference + jnp.argmax. Includes a ragged tail (N % block_n != 0).
    from fastforward_tpu.kernels.matmul import (
        matmul_w4a8_2l_gemv_argmax,
        matmul_w4a8_2l_reference,
    )

    rng = np.random.RandomState(11)
    K, N, g = 256, 640, 128  # N not divisible by block_n=512
    p2, mult, s_col = _two_level_head(rng, K, N, g)
    x = jnp.asarray(rng.randn(8, K).astype(np.float32) * 0.1)
    x_q, x_scale = quantize_rowwise(x)

    tok = matmul_w4a8_2l_gemv_argmax(
        x_q, x_scale, p2, mult, s_col, group_size=g, paired=True
    )
    logits = matmul_w4a8_2l_reference(
        x_q, x_scale, p2, mult, s_col, group_size=g, out_dtype=jnp.float32,
        paired=True,
    )
    ref = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref))
    assert tok.dtype == jnp.int32
    assert int(np.max(np.asarray(tok))) < N


def test_gemv_argmax_ties_first_occurrence():
    # Deliberate exact ties: duplicate weight columns produce identical
    # logits; first occurrence must win (jnp.argmax contract).
    from fastforward_tpu.kernels.matmul import matmul_w4a8_2l_gemv_argmax

    rng = np.random.RandomState(3)
    K, N, g = 256, 256, 128
    p2, mult, s_col = _two_level_head(rng, K, N, g)
    # duplicate every column pair: cols 2j and 2j+1 identical
    p2 = jnp.repeat(p2[:, ::2], 2, axis=1)
    mult = jnp.repeat(mult[:, ::2], 2, axis=1)
    s_col = jnp.repeat(s_col[::2], 2, axis=0)
    x = jnp.asarray(rng.randn(4, K).astype(np.float32) * 0.1)
    x_q, x_scale = quantize_rowwise(x)
    tok = np.asarray(
        matmul_w4a8_2l_gemv_argmax(x_q, x_scale, p2, mult, s_col, group_size=g,
                                   paired=True)
    )
    assert np.all(tok % 2 == 0), tok  # even index = first of each tied pair


def test_preblocked_stacked_gemv_matches_flat_layout():
    # GIVEN stacked paired weights in both the flat (L, K//2, N) layout and
    # the pre-blocked (L, N//bn, K//2, bn) layout (preblock_stacked)
    from fastforward_tpu.kernels import (
        matmul_w4a8_2l_gemv_stacked,
        quantize_rowwise,
    )
    from fastforward_tpu.kernels.matmul import preblock_stacked
    from fastforward_tpu.kernels.packing import pack_mult_nibbles

    rng = np.random.RandomState(17)
    L, K, N, g, bn = 2, 512, 512, 128, 256
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    wp4 = preblock_stacked(wp, bn)
    assert wp4.shape == (L, N // bn, K // 2, bn)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int8)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 1e-2)
    x_q, x_scale = quantize_rowwise(jnp.asarray(rng.randn(4, K), jnp.float32))
    mp = pack_mult_nibbles(mult)
    # THEN the 4-D entry is bit-identical to the flat entry per layer
    for l in range(L):
        flat = matmul_w4a8_2l_gemv_stacked(
            x_q, x_scale, wp, mp, s_col, jnp.asarray(l, jnp.int32),
            out_dtype=jnp.float32,
        )
        pre = matmul_w4a8_2l_gemv_stacked(
            x_q, x_scale, wp4, mp, s_col, jnp.asarray(l, jnp.int32),
            out_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(pre), np.asarray(flat))


def test_preblocked_stacked_dequant_matches_flat_layout():
    from fastforward_tpu.kernels.matmul import (
        dequantize_int4_paired_stacked,
        preblock_stacked,
    )

    rng = np.random.RandomState(19)
    L, K, N, g, bn = 2, 512, 512, 128, 256
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    wp4 = preblock_stacked(wp, bn)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int32)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 1e-2)
    for l in range(L):
        flat = dequantize_int4_paired_stacked(
            wp, mult, s_col, jnp.asarray(l, jnp.int32), group_size=g
        )
        pre = dequantize_int4_paired_stacked(
            wp4, mult, s_col, jnp.asarray(l, jnp.int32), group_size=g
        )
        np.testing.assert_array_equal(np.asarray(pre), np.asarray(flat))


def test_preblock_fuse_and_decode_matches_flat(monkeypatch):
    # GIVEN a tiny stacked model fused under FF_2L_PREBLOCK=1
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    # paired layout needs an even number of K-groups -> hidden >= 2*group;
    # all projection N dims must divide FF_2L_BLOCK_N
    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_seq_len=128,
        dtype=jnp.float32,
    )
    params, stacked = random_stacked_params(config, mode="w4a8_2l", seed=3)
    fused_flat = fuse_stacked_layers(stacked)
    monkeypatch.setenv("FF_2L_PREBLOCK", "1")
    monkeypatch.setenv("FF_2L_BLOCK_N", "128")
    fused_pre = fuse_stacked_layers(stacked)
    assert fused_pre.qkv_proj.data.ndim == 4
    ids = jnp.asarray(np.random.RandomState(0).randint(0, config.vocab_size, (2, 8)))

    def run(fused):
        cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=2, max_len=32,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=True,
        )
        logits, cache = serving_forward_stacked(
            params, fused, config, ids, cache=cache
        )
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(ids.dtype)[:, None]
        logits2, _ = serving_forward_stacked(
            params, fused, config, tok, cache=cache
        )
        return np.asarray(logits), np.asarray(logits2)

    p1, d1 = run(fused_flat)
    p2, d2 = run(fused_pre)
    # THEN prefill and decode logits are identical across layouts
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(d1, d2)


# --- W4A4 two-level (vertical layout, int4 MXU dots) -------------------------


def test_pack_int4_vertical_roundtrip():
    from fastforward_tpu.kernels.packing import (
        pack_int4_vertical,
        unpack_int4_vertical,
    )

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randint(-8, 8, size=(256, 64)), dtype=jnp.int8)
    packed = pack_int4_vertical(w)
    assert packed.shape == (128, 64)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_vertical(packed)), np.asarray(w)
    )


def test_w4a4_2l_conversion_grid_matches_w4a8_2l():
    """convert_two_level_a4 produces the SAME two-level grid (mult, s_col,
    quantized values) as convert_two_level — only the at-rest layout
    differs."""
    from fastforward_tpu.kernels.matmul import (
        convert_two_level,
        convert_two_level_a4,
    )
    from fastforward_tpu.kernels.packing import (
        unpack_int4_vertical,
        unpack_uint4_offset_paired,
    )

    rng = np.random.RandomState(1)
    K, N, g = 256, 64, 64
    q = rng.randint(-8, 8, size=(K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N) * 0.1 + 0.01).astype(np.float32)
    packed = pack_int4(jnp.asarray(q), group_size=g)

    p8, m8, s8 = convert_two_level(packed, jnp.asarray(w_scale), g, paired=True)
    p4, m4, s4 = convert_two_level_a4(packed, jnp.asarray(w_scale), g)

    np.testing.assert_array_equal(np.asarray(m8), np.asarray(m4))
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s4))
    v8 = np.asarray(unpack_uint4_offset_paired(p8, g))
    v4 = np.asarray(unpack_int4_vertical(p4))
    np.testing.assert_array_equal(v8, v4)


def test_w4a4_2l_reference_oracle():
    """Integer-exact oracle: reference == dequantized float matmul."""
    from fastforward_tpu.kernels.matmul import (
        convert_two_level_a4,
        matmul_w4a4_2l_reference,
        quantize_rowwise_a4,
    )
    from fastforward_tpu.kernels.packing import unpack_int4_vertical

    rng = np.random.RandomState(2)
    M, K, N, g = 8, 256, 128, 64
    w = rng.randn(K, N).astype(np.float32) * 0.05
    wg = w.reshape(K // g, g, N)
    w_scale = np.maximum(np.abs(wg).max(1) / 7.0, 1e-8).astype(np.float32)
    q = np.clip(np.round(wg / w_scale[:, None, :]), -8, 7).astype(np.int8)
    packed = pack_int4(jnp.asarray(q.reshape(K, N)), group_size=g)
    p4, mult, s_col = convert_two_level_a4(packed, jnp.asarray(w_scale), g)

    x = rng.randn(M, K).astype(np.float32)
    x_q, x_s = quantize_rowwise_a4(jnp.asarray(x))
    assert np.abs(np.asarray(x_q)).max() <= 8

    out = np.asarray(
        matmul_w4a4_2l_reference(
            x_q, x_s, p4, mult, s_col, group_size=g, out_dtype=jnp.float32
        )
    )
    v = np.asarray(unpack_int4_vertical(p4)).reshape(K // g, g, N)
    s_eff = np.asarray(mult).astype(np.float32) * np.asarray(s_col)[None, :]
    w_deq = (v.astype(np.float32) * s_eff[:, None, :]).reshape(K, N)
    x_deq = np.asarray(x_q, np.float32) * np.asarray(x_s)[:, None]
    np.testing.assert_allclose(out, x_deq @ w_deq, rtol=1e-5, atol=1e-5)


def test_w4a4_2l_stacked_matches_reference():
    """CPU path of the stacked wrapper == per-layer reference."""
    from fastforward_tpu.kernels.matmul import (
        matmul_w4a4_2l_gemv_stacked,
        matmul_w4a4_2l_reference,
    )
    from fastforward_tpu.kernels.packing import pack_mult_nibbles

    rng = np.random.RandomState(3)
    L, M, K, N, g = 3, 4, 128, 128, 64
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int8)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 0.01)
    x_q = jnp.asarray(rng.randint(-8, 8, (M, K)), jnp.int8)
    x_s = jnp.asarray(rng.rand(M).astype(np.float32) + 0.1)

    mp = pack_mult_nibbles(mult.reshape(L * (K // g), N)).reshape(L, -1, N) \
        if False else jnp.stack([pack_mult_nibbles(mult[i]) for i in range(L)])
    for layer in range(L):
        got = np.asarray(
            matmul_w4a4_2l_gemv_stacked(
                x_q, x_s, wp, mp, s_col, jnp.asarray(layer), group_size=g,
                out_dtype=jnp.float32,
            )
        )
        want = np.asarray(
            matmul_w4a4_2l_reference(
                x_q, x_s, wp[layer], mult[layer], s_col[layer], group_size=g,
                out_dtype=jnp.float32,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_quantlinear_w4a4_mode_and_call_layer():
    """quantize_linear w4a4_2l end-to-end: decode GEMV (CPU reference) and
    prefill dequant path agree with the simulated grid; stacked call_layer
    matches per-layer __call__."""
    import dataclasses

    from fastforward_tpu.serving.engine import quantize_linear
    from fastforward_tpu.serving.stacked import _with_packed_mult

    rng = np.random.RandomState(4)
    K, N = 256, 128
    w = rng.randn(K, N).astype(np.float32) * 0.05
    ql = quantize_linear(jnp.asarray(w), "w4a4_2l", group_size=64)
    assert ql.mode == "w4a4_2l" and ql.mult is not None

    x = rng.randn(4, K).astype(np.float32) * 0.5
    out = np.asarray(ql(jnp.asarray(x), out_dtype=jnp.float32))
    # A4 activations + W4 two-level weights: coarse grid — sanity vs fp32
    ref = x @ w
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.25, f"W4A4 output too far from fp32: rel {rel:.3f}"

    # stacked call_layer == sliced __call__
    stacked = dataclasses.replace(
        ql,
        data=jnp.stack([ql.data, ql.data]),
        scale=jnp.stack([ql.scale, ql.scale]),
        mult=jnp.stack([ql.mult, ql.mult]),
    )
    stacked = _with_packed_mult(stacked)
    got = np.asarray(
        stacked.call_layer(jnp.asarray(x), jnp.asarray(1), out_dtype=jnp.float32)
    )
    np.testing.assert_array_equal(got, out)


def test_dequantize_int4_vertical_stacked_cpu_matches_manual():
    from fastforward_tpu.kernels.matmul import dequantize_int4_vertical_stacked
    from fastforward_tpu.kernels.packing import unpack_int4_vertical

    rng = np.random.RandomState(5)
    L, K, N, g = 2, 256, 128, 64
    wp = jnp.asarray(rng.randint(-128, 128, (L, K // 2, N)), jnp.int8)
    mult = jnp.asarray(rng.randint(1, 16, (L, K // g, N)), jnp.int8)
    s_col = jnp.asarray(rng.rand(L, N).astype(np.float32) * 0.01)
    for layer in range(L):
        got = np.asarray(dequantize_int4_vertical_stacked(
            wp, mult, s_col, jnp.asarray(layer), group_size=g
        ), np.float32)
        v = np.asarray(unpack_int4_vertical(wp[layer])).reshape(K // g, g, N)
        s_eff = (np.asarray(mult[layer], np.float32)
                 * np.asarray(s_col[layer])[None, :])
        want = (v.astype(np.float32) * s_eff[:, None, :]).reshape(K, N)
        np.testing.assert_allclose(
            got, want.astype(np.float32), rtol=1e-2, atol=1e-2
        )
