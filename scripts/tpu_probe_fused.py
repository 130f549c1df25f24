#!/usr/bin/env python
"""Real-TPU correctness probe for the fused o+MLP layer-tail kernel.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_fused.py"""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels import pack_int4
from fastforward_tpu.kernels.matmul import (
    convert_two_level,
    fused_o_mlp_reference,
    fused_o_mlp_stacked,
)
from fastforward_tpu.kernels.packing import pack_mult_nibbles


def build(rng, L, K, N, g=128):
    per_layer = []
    for _ in range(L):
        w_q = rng.randint(-8, 8, (K, N)).astype(np.int8)
        w_scale = (rng.rand(K // g, N).astype(np.float32) + 0.5) * 2e-2
        packed = pack_int4(jnp.asarray(w_q), group_size=g)
        per_layer.append(convert_two_level(packed, jnp.asarray(w_scale), g, paired=True))
    w = jnp.stack([p[0] for p in per_layer])
    mp = jnp.stack([pack_mult_nibbles(p[1]) for p in per_layer])
    sc = jnp.stack([p[2] for p in per_layer])
    return w, mp, sc, per_layer


def check(name, M, H, INTER, L=2, g=128, atol=0.05):
    rng = np.random.RandomState(0)
    o_w, o_mp, o_sc, o_pl = build(rng, L, H, H, g)
    gu_w, gu_mp, gu_sc, gu_pl = build(rng, L, H, 2 * INTER, g)
    dn_w, dn_mp, dn_sc, dn_pl = build(rng, L, INTER, H, g)
    norm_w = jnp.asarray(rng.rand(L, H).astype(np.float32) + 0.5)
    attn = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.3, jnp.bfloat16)
    x_res = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5, jnp.bfloat16)

    ok = True
    for l in range(L):
        out = jax.jit(
            lambda a, x, li: fused_o_mlp_stacked(
                a, x, norm_w, o_w, o_mp, o_sc, gu_w, gu_mp, gu_sc,
                dn_w, dn_mp, dn_sc, li, group_size=g,
            )
        )(attn, x_res, jnp.asarray(l, jnp.int32))
        ref = fused_o_mlp_reference(
            attn.astype(jnp.float32), x_res.astype(jnp.float32), norm_w[l],
            o_pl[l][0], o_pl[l][1], o_pl[l][2],
            gu_pl[l][0], gu_pl[l][1], gu_pl[l][2],
            dn_pl[l][0], dn_pl[l][1], dn_pl[l][2], group_size=g,
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-9)
        status = "OK " if rel <= atol else "FAIL"
        print(f"{status} {name} l={l}: max|err|={err:.5f} rel={rel:.5f}")
        ok &= rel <= atol
    return ok


def check_qkv(name, M, H, N, L=2, g=128, atol=0.05):
    from fastforward_tpu.kernels.matmul import (
        fused_norm_qkv_reference,
        fused_norm_qkv_stacked,
    )

    rng = np.random.RandomState(4)
    w, mp, sc, pl_ = build(rng, L, H, N, g)
    norm_w = jnp.asarray(rng.rand(L, H).astype(np.float32) + 0.5)
    x = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5, jnp.bfloat16)
    ok = True
    for l in range(L):
        out = jax.jit(
            lambda xx, li: fused_norm_qkv_stacked(
                xx, norm_w, w, mp, sc, li, group_size=g,
            )
        )(x, jnp.asarray(l, jnp.int32))
        ref = fused_norm_qkv_reference(
            x.astype(jnp.float32), norm_w[l], pl_[l][0], pl_[l][1], pl_[l][2],
            group_size=g,
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-9)
        status = "OK " if rel <= atol else "FAIL"
        print(f"{status} qkv:{name} l={l}: max|err|={err:.5f} rel={rel:.5f}")
        ok &= rel <= atol
    return ok


def main():
    assert jax.default_backend() in ("tpu", "axon")
    ok = True
    ok &= check("small", M=8, H=512, INTER=1024)
    ok &= check("8b-shape", M=32, H=4096, INTER=14336, L=1)
    ok &= check_qkv("small", M=8, H=512, N=768)
    ok &= check_qkv("8b-shape", M=32, H=4096, N=6144, L=1)
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
