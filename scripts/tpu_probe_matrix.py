#!/usr/bin/env python
"""Real-TPU kernel variant matrix probe: runs the `tests/kernels/
test_variant_matrix.py` sweeps on hardware, where the entry points hit the
actual Pallas kernels instead of their CPU oracle fallbacks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_matrix.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

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

FAILURES = []


def _check(name, out, ref, rtol=5e-3, atol=5e-3):
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    denom = np.max(np.abs(np.asarray(ref, np.float32))) + 1e-9
    ok = err / denom <= rtol or err <= atol
    print(f"{'OK ' if ok else 'FAIL'} {name}: max|err|={err:.5f}")
    if not ok:
        FAILURES.append(name)


def _make(rng, K, N, g, paired):
    w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
    w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 2e-2
    packed = pack_int4(jnp.asarray(w_q), group_size=g)
    return convert_two_level(packed, jnp.asarray(w_scale), g, paired=paired)


def gemv_matrix():
    rng = np.random.RandomState(0)
    M, K, N, g = 8, 512, 1024, 128
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1)
    x_q, x_s = quantize_rowwise(x)
    for paired in (True, False):
        p2, mult, s_col = _make(rng, K, N, g, paired)
        ref = matmul_w4a8_2l_reference(
            x_q, x_s, p2, mult, s_col, None, g, jnp.float32, paired=paired
        )
        for concat in (1, 2, 4):
            os.environ["FF_2L_CONCAT"] = str(concat)
            for bn in (256, 512):
                out = jax.jit(
                    lambda xq, xs: matmul_w4a8_2l_gemv(
                        xq, xs, p2, mult, s_col, group_size=g,
                        out_dtype=jnp.float32, block_n=bn, paired=paired,
                    )
                )(x_q, x_s)
                _check(f"gemv paired={paired} concat={concat} bn={bn}", out, ref)
    os.environ.pop("FF_2L_CONCAT", None)


def stacked_matrix():
    rng = np.random.RandomState(1)
    L, M, K, N, g = 3, 8, 512, 1024, 128
    per_layer = [_make(rng, K, N, g, True) for _ in range(L)]
    w = jnp.stack([p[0] for p in per_layer])
    mp = jnp.stack([pack_mult_nibbles(p[1]) for p in per_layer])
    sc = jnp.stack([p[2] for p in per_layer])
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1)
    x_q, x_s = quantize_rowwise(x)
    for dotraw in (False, True):
        for splitw in (False, True):
            for preblock in (False, True):
                os.environ["FF_2L_DOTRAW"] = "1" if dotraw else "0"
                os.environ["FF_2L_SPLITW"] = "1" if splitw else "0"
                wv = preblock_stacked(w, 512) if preblock else w
                for l in range(L):
                    out = jax.jit(
                        lambda xq, xs, li: matmul_w4a8_2l_gemv_stacked(
                            xq, xs, wv, mp, sc, li, group_size=g,
                            out_dtype=jnp.float32,
                        )
                    )(x_q, x_s, jnp.asarray(l, jnp.int32))
                    ref = matmul_w4a8_2l_reference(
                        x_q, x_s, per_layer[l][0], per_layer[l][1],
                        per_layer[l][2], None, g, jnp.float32, paired=True,
                    )
                    _check(
                        f"stacked dotraw={dotraw} splitw={splitw} "
                        f"preblock={preblock} l={l}", out, ref,
                    )
    os.environ.pop("FF_2L_DOTRAW", None)
    os.environ.pop("FF_2L_SPLITW", None)


def flash_matrix():
    from fastforward_tpu.kernels.attention import (
        flash_decode_int8,
        flash_decode_int8_reference,
        flash_decode_int8_stacked,
    )

    rng = np.random.RandomState(2)
    B, Hkv, groups, S, d = 2, 4, 4, 512, 128
    H = Hkv * groups
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.01 + 0.005)
    vs = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.01 + 0.005)
    lengths = jnp.asarray([100, S - 1], jnp.int32)
    ref = flash_decode_int8_reference(q, k, ks, v, vs, lengths)
    for allheads in ("1", "0"):
        for batched in ("1", "0"):
            os.environ["FF_FLASH_ALLHEADS"] = allheads
            os.environ["FF_FLASH_BATCHED"] = batched
            out = flash_decode_int8(q, k, ks, v, vs, lengths)
            _check(f"flash allheads={allheads} batched={batched}", out, ref,
                   rtol=2e-2, atol=2e-2)

    L = 2
    ks5 = jnp.stack([k, k]), jnp.stack([v, v])
    kss = jnp.stack([ks, ks]); vss = jnp.stack([vs, vs])
    for clamp in ("0", "1"):
        os.environ["FF_FLASH_CLAMP"] = clamp
        out = flash_decode_int8_stacked(
            q, ks5[0], kss, ks5[1], vss, lengths, jnp.asarray(1, jnp.int32)
        )
        _check(f"flash stacked clamp={clamp}", out, ref, rtol=2e-2, atol=2e-2)
    for var in ("FF_FLASH_ALLHEADS", "FF_FLASH_BATCHED", "FF_FLASH_CLAMP"):
        os.environ.pop(var, None)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    gemv_matrix()
    stacked_matrix()
    flash_matrix()
    print("ALL OK" if not FAILURES else f"FAILURES: {FAILURES}")
    raise SystemExit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
