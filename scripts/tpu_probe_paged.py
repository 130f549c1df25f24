#!/usr/bin/env python
"""Real-TPU correctness probe for the paged KV kernels (attention + append).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_paged.py"""

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.paged_attention import (
    paged_flash_decode_int8,
    paged_flash_decode_reference,
    paged_kv_append_decode_int8,
    paged_kv_append_reference,
)


def setup(rng, L, P, Hkv, page, d, B, MP):
    k_pool = jnp.asarray(rng.randint(-127, 128, (L, P, Hkv, page, d)), jnp.int8)
    v_pool = jnp.asarray(rng.randint(-127, 128, (L, P, Hkv, page, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(L, P, Hkv, page).astype(np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.rand(L, P, Hkv, page).astype(np.float32) * 0.02 + 0.01)
    table = jnp.asarray(
        rng.permutation(P)[: B * MP].reshape(B, MP), jnp.int32
    )
    return k_pool, v_pool, ks, vs, table


def check_attn(name, B, H, Hkv, page, d, MP, L=2, seed=0, atol=0.02):
    rng = np.random.RandomState(seed)
    P = B * MP + 2
    k_pool, v_pool, ks, vs, table = setup(rng, L, P, Hkv, page, d, B, MP)
    q = jnp.asarray(rng.randn(B, H, d).astype(np.float32) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray(
        rng.choice([1, 7, page, page + 1, MP * page], size=(B,)), jnp.int32
    )
    ok = True
    for l in range(L):
        out = jax.jit(
            lambda qq, li: paged_flash_decode_int8(
                qq, k_pool, ks, v_pool, vs, table, lengths, li
            )
        )(q, jnp.asarray(l, jnp.int32))
        ref = paged_flash_decode_reference(
            q, k_pool[l], ks[l], v_pool[l], vs[l], table, lengths
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
        status = "OK " if rel <= atol else "FAIL"
        print(f"{status} attn:{name} l={l}: rel={rel:.5f}")
        ok &= rel <= atol
    return ok


def check_append(name, B, Hkv, page, d, MP, L=2, seed=1):
    rng = np.random.RandomState(seed)
    P = B * MP + 2
    k_pool, v_pool, ks, vs, table = setup(rng, L, P, Hkv, page, d, B, MP)
    positions = jnp.asarray(
        rng.randint(0, MP * page, size=(B,)), jnp.int32
    )
    k_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, Hkv, 1, d)), jnp.int8)
    ks_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    vs_new = jnp.asarray(rng.rand(B, Hkv, 1).astype(np.float32))
    layer = jnp.asarray(L - 1, jnp.int32)
    ref = paged_kv_append_reference(
        k_pool, v_pool, ks, vs, k_new, v_new, ks_new, vs_new,
        positions, table, layer,
    )
    ref = jax.tree.map(lambda a: np.asarray(a), list(ref))
    out = jax.jit(
        lambda kp, vp, ksp, vsp: paged_kv_append_decode_int8(
            kp, vp, ksp, vsp, k_new, v_new, ks_new, vs_new,
            positions, table, layer,
        ),
        donate_argnums=(0, 1, 2, 3),
    )(k_pool, v_pool, ks, vs)
    ok = True
    for a, b, nm in zip(out, ref, ("k", "v", "ks", "vs")):
        match = bool((np.asarray(a, np.float32) == np.asarray(b, np.float32)).all())
        print(f"{'OK ' if match else 'FAIL'} append:{name}:{nm}")
        ok &= match
    return ok


def main():
    assert jax.default_backend() in ("tpu", "axon")
    ok = True
    ok &= check_attn("small", B=4, H=8, Hkv=2, page=128, d=128, MP=3)
    ok &= check_attn("8b-shape", B=32, H=32, Hkv=8, page=256, d=128, MP=4, L=1, seed=2)
    ok &= check_append("small", B=4, Hkv=2, page=128, d=128, MP=3)
    ok &= check_append("8b-shape", B=32, Hkv=8, page=256, d=128, MP=4, L=1, seed=3)
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
