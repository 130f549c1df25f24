"""Kernel variant matrix: every reachable configuration of the two-level
GEMV and flash-decode kernels against its oracle (round-1 review item 10 —
the paired × concat × dotraw × block_n space was mostly exercised only
through the default path).

On CPU the entry points dispatch to their XLA references, so what these
tests pin is (a) the dispatch plumbing of every knob combination and (b)
the reference semantics the TPU kernels are probed against
(`scripts/tpu_probe_*.py` run the same matrix on hardware).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.kernels import (
    convert_two_level,
    matmul_w4a8_2l_gemv,
    matmul_w4a8_2l_gemv_stacked,
    matmul_w4a8_2l_reference,
    pack_int4,
    quantize_rowwise,
)
from fastforward_tpu.kernels.matmul import preblock_stacked
from fastforward_tpu.kernels.packing import pack_mult_nibbles


def _make(rng, K, N, g, paired):
    w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 2e-2
    packed = pack_int4(jnp.asarray(w_q), group_size=g)
    return convert_two_level(packed, jnp.asarray(w_scale), g, paired=paired)


@pytest.mark.parametrize("paired", [True, False])
@pytest.mark.parametrize("concat", [1, 2, 4])
@pytest.mark.parametrize("block_n", [128, 256, 512])
def test_gemv_two_level_matrix(monkeypatch, paired, concat, block_n):
    # paired × FF_2L_CONCAT × block_n against the explicit-layout reference.
    monkeypatch.setenv("FF_2L_CONCAT", str(concat))
    rng = np.random.RandomState(7 * concat + block_n + paired)
    M, K, N, g = 4, 512, 384, 128
    p2, mult, s_col = _make(rng, K, N, g, paired)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1)
    x_q, x_s = quantize_rowwise(x)

    out = matmul_w4a8_2l_gemv(
        x_q, x_s, p2, mult, s_col, group_size=g, out_dtype=jnp.float32,
        block_n=block_n, paired=paired,
    )
    ref = matmul_w4a8_2l_reference(
        x_q, x_s, p2, mult, s_col, None, g, jnp.float32, paired=paired,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("dotraw", [False, True])
@pytest.mark.parametrize("splitw", [False, True])
@pytest.mark.parametrize("preblock", [False, True])
def test_gemv_stacked_matrix(monkeypatch, dotraw, splitw, preblock):
    # stacked layer-indexed entry: dotraw × splitw × preblocked layout.
    monkeypatch.setenv("FF_2L_DOTRAW", "1" if dotraw else "0")
    monkeypatch.setenv("FF_2L_SPLITW", "1" if splitw else "0")
    rng = np.random.RandomState(3)
    L, M, K, N, g = 3, 4, 512, 256, 128
    per_layer = [_make(rng, K, N, g, True) for _ in range(L)]
    w = jnp.stack([p[0] for p in per_layer])
    if preblock:
        w = preblock_stacked(w, 128)
    mp = jnp.stack([pack_mult_nibbles(p[1]) for p in per_layer])
    sc = jnp.stack([p[2] for p in per_layer])
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1)
    x_q, x_s = quantize_rowwise(x)

    for l in range(L):
        out = matmul_w4a8_2l_gemv_stacked(
            x_q, x_s, w, mp, sc, jnp.asarray(l, jnp.int32),
            group_size=g, out_dtype=jnp.float32,
        )
        ref = matmul_w4a8_2l_reference(
            x_q, x_s, per_layer[l][0], per_layer[l][1], per_layer[l][2],
            None, g, jnp.float32, paired=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("allheads", [True, False])
@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("S", [96, 128, 384])  # incl. non-pow2 ragged extent
def test_flash_decode_matrix(monkeypatch, allheads, batched, S):
    from fastforward_tpu.kernels.attention import (
        flash_decode_int8,
        flash_decode_int8_reference,
    )

    monkeypatch.setenv("FF_FLASH_ALLHEADS", "1" if allheads else "0")
    monkeypatch.setenv("FF_FLASH_BATCHED", "1" if batched else "0")
    rng = np.random.RandomState(S + allheads * 2 + batched)
    B, Hkv, groups, d = 2, 2, 4, 128
    H = Hkv * groups
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32))
    k = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    lengths = jnp.asarray([S // 3, S - 1], jnp.int32)  # ragged live lengths

    out = flash_decode_int8(q, k, ks, v, vs, lengths)
    ref = flash_decode_int8_reference(q, k, ks, v, vs, lengths)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("clamp", [False, True])
def test_flash_decode_stacked_matrix(monkeypatch, clamp):
    from fastforward_tpu.kernels.attention import (
        flash_decode_int8_reference,
        flash_decode_int8_stacked,
    )

    monkeypatch.setenv("FF_FLASH_CLAMP", "1" if clamp else "0")
    rng = np.random.RandomState(11 + clamp)
    L, B, Hkv, groups, S, d = 3, 2, 2, 4, 256, 128
    H = Hkv * groups
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32))
    k = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    lengths = jnp.asarray([17, 200], jnp.int32)

    for l in range(L):
        out = flash_decode_int8_stacked(
            q, k, ks, v, vs, lengths, jnp.asarray(l, jnp.int32)
        )
        ref = flash_decode_int8_reference(
            q, k[l], ks[l], v[l], vs[l], lengths
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )
