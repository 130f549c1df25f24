#!/usr/bin/env python
"""Real-TPU correctness probe for the ragged (length-aware) flash decode.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_ragged.py"""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.attention import (
    flash_decode_int8_reference,
    flash_decode_int8_stacked_ragged,
)


def check(name, B, H, Hkv, S, d, L=2, seed=0, atol=0.02):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    v = jnp.asarray(rng.randint(-127, 128, (L, B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, B, Hkv, S).astype(np.float32) * 0.02 + 0.01)
    # mixed true lengths incl. <1 block, exact block multiples, and full S
    lengths = jnp.asarray(
        rng.choice([1, 7, 160, 256, 257, S], size=(B,)), jnp.int32
    )
    ok = True
    for l in range(L):
        out = jax.jit(
            lambda qq, li: flash_decode_int8_stacked_ragged(
                qq, k, ks, v, vs, lengths, li
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
    assert jax.default_backend() in ("tpu", "axon")
    ok = True
    ok &= check("small", B=4, H=8, Hkv=2, S=512, d=128)
    ok &= check("8b-shape", B=32, H=32, Hkv=8, S=512, d=128, L=1, seed=1)
    ok &= check("longctx", B=8, H=32, Hkv=8, S=2048, d=128, L=1, seed=2)
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
