#!/usr/bin/env python
"""Real-TPU correctness probe for the flash prefill kernel.

Runs `flash_prefill` (Pallas) against `flash_prefill_reference` (XLA) on
the TPU backend across int8/bf16 KV, GQA groups, start offsets and ragged
block tails. Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_prefill.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.attention import (
    flash_prefill,
    flash_prefill_reference,
)


def check(name, B, Hkv, groups, T, S, d, start, quantized, atol):
    rng = np.random.RandomState(hash(name) % 2**31)
    H = Hkv * groups
    q = jnp.asarray(rng.randn(B, H, T, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    if quantized:
        k = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
        v = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, d)), jnp.int8)
        ks = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.02 + 0.005)
        vs = jnp.asarray(rng.rand(B, Hkv, S).astype(np.float32) * 0.02 + 0.005)
    else:
        k = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, Hkv, S, d).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        ks = vs = None
    starts = jnp.full((B,), start, jnp.int32)

    out = jax.jit(flash_prefill)(q, k, ks, v, vs, starts)
    ref = jax.jit(flash_prefill_reference)(q, k, ks, v, vs, starts)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    status = "OK " if err <= atol else "FAIL"
    print(f"{status} {name}: max|err|={err:.5f} (atol {atol})")
    return err <= atol


def main():
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    ok = True
    ok &= check("int8 GQA4 fresh", 2, 2, 4, 256, 512, 128, 0, True, 0.02)
    ok &= check("int8 GQA4 chunked(start=512)", 2, 2, 4, 256, 1024, 128, 512, True, 0.02)
    ok &= check("bf16 MHA fresh", 2, 4, 1, 128, 256, 128, 0, False, 0.02)
    ok &= check("int8 GQA4 ragged T=96", 1, 2, 4, 96, 256, 128, 0, True, 0.02)
    ok &= check("int8 llama8b-shape T=2048", 1, 8, 4, 2048, 2048, 128, 0, True, 0.02)
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
