#!/usr/bin/env python
"""Real-TPU correctness probe for the large-batch fused o+gateup kernel
(`kernels/matmul.py:fused_o_gu_stacked`) vs its XLA oracle.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_ogu.py"""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.matmul import (
    fused_o_gu_reference,
    fused_o_gu_stacked,
)
from fastforward_tpu.kernels.packing import pack_mult_nibbles
from fastforward_tpu.serving.engine import quantize_linear


def make(L, K, N, g, seed):
    rng = np.random.RandomState(seed)
    qs = [
        quantize_linear(
            jnp.asarray(rng.randn(K, N).astype(np.float32) / 16.0),
            "w4a8_2l", group_size=g,
        )
        for _ in range(L)
    ]
    assert qs[0].paired and qs[0].mult is not None
    data = jnp.stack([q.data for q in qs])
    mult = jnp.stack([q.mult for q in qs])
    mp = pack_mult_nibbles(mult)
    sc = jnp.stack([q.scale for q in qs])
    return data, mp, sc, mult


def check(name, M, H, inter, L=2, g=128, seed=0, atol=0.01):
    rng = np.random.RandomState(seed)
    attn = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.3, jnp.bfloat16)
    x_res = jnp.asarray(rng.randn(M, H).astype(np.float32) * 0.5, jnp.bfloat16)
    norm_w = jnp.asarray(rng.rand(L, H).astype(np.float32) + 0.5)
    o_w, o_mp, o_sc, o_m = make(L, H, H, g, seed + 1)
    gu_w, gu_mp, gu_sc, gu_m = make(L, H, 2 * inter, g, seed + 2)
    ok = True
    for l in range(L):
        x1, gu = jax.jit(
            lambda a, r: fused_o_gu_stacked(
                a, r, norm_w, o_w, o_mp, o_sc, gu_w, gu_mp, gu_sc,
                jnp.asarray(l, jnp.int32), group_size=g,
            )
        )(attn, x_res)
        rx1, rgu = fused_o_gu_reference(
            attn.astype(jnp.float32), x_res.astype(jnp.float32), norm_w[l],
            o_w[l], o_m[l], o_sc[l], gu_w[l], gu_m[l], gu_sc[l], g,
        )
        for tag, out, ref in (("x1", x1, rx1), ("gu", gu, rgu)):
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
            status = "OK " if rel <= atol else "FAIL"
            print(f"{status} {name} l={l} {tag}: max|err|={err:.5f} rel={rel:.5f}",
                  flush=True)
            ok &= rel <= atol
    return ok


ok = True
ok &= check("small", M=8, H=512, inter=1024)
ok &= check("bm96", M=96, H=1024, inter=2048, seed=3)
ok &= check("bm192-8bshape", M=192, H=4096, inter=14336, L=1, seed=5)
print("ALL OK" if ok else "FAILURES", flush=True)
