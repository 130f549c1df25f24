#!/usr/bin/env python
"""Real-TPU correctness probe for bucketed-S flash decode (s_blocks grid
prefix). Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_bucketed.py"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.attention import (
    flash_decode_int8_reference,
    flash_decode_int8_stacked,
)


def check(name, B, H, Hkv, S, d, s_blocks, max_len, L=2, seed=0, atol=0.02):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    # lengths within the prefix covered by s_blocks (caller contract)
    cand = [c for c in (1, 7, 160, 256, 257, 384, max_len) if c <= max_len]
    lengths = jnp.asarray(rng.choice(cand, size=(B,)), jnp.int32)
    ok = True
    for l in range(L):
        out = jax.jit(
            lambda qq, li: flash_decode_int8_stacked(
                qq, k, ks, v, vs, lengths, li, s_blocks=s_blocks
            )
        )(q, jnp.asarray(l, jnp.int32))
        ref = flash_decode_int8_reference(
            q, k[l], ks[l], v[l], vs[l], lengths
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
        status = "OK " if rel <= atol else "FAIL"
        print(f"{status} {name} l={l}: max|err|={err:.5f} rel={rel:.5f}")
        ok &= rel <= atol
    return ok


def main():
    print("devices:", jax.devices())
    ok = True
    ok &= check("S=512 nb=1 (len<=256)", B=8, H=32, Hkv=8, S=512, d=128,
                s_blocks=1, max_len=256)
    ok &= check("S=512 nb=2 (len<=512)", B=8, H=32, Hkv=8, S=512, d=128,
                s_blocks=2, max_len=512)
    ok &= check("S=768 nb=2 (len<=512)", B=4, H=32, Hkv=8, S=768, d=128,
                s_blocks=2, max_len=512)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
