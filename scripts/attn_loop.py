#!/usr/bin/env python
"""Isolated decode-attention loop (the non-GEMV half of the step budget).

Mirrors `scripts/gemv_loop.py` for the attention side: a jitted lax.scan
over decode steps, each scanning 32 layers of ragged flash decode over an
8B-shaped INT8 KV slab (+ optionally the KV append), with a data
dependence between steps. Whole-loop wall time only.

Env: AL_BATCH (192), AL_STEPS (16), AL_SLAB (512), AL_LIVE (256),
AL_APPEND (1).
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/attn_loop.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.attention import flash_decode_int8_stacked_ragged
from fastforward_tpu.kernels.kv_update import kv_append_decode_int8_stacked

B = int(os.environ.get("AL_BATCH", "192"))
STEPS = int(os.environ.get("AL_STEPS", "16"))
S = int(os.environ.get("AL_SLAB", "512"))
LIVE = int(os.environ.get("AL_LIVE", "256"))
APPEND = os.environ.get("AL_APPEND", "1") == "1"
L, H, HKV, D = 32, 32, 8, 128


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_kv():
        k1, k2 = jax.random.split(key)
        kc = jax.random.randint(k1, (L, B, HKV, S, D), -127, 128, jnp.int8)
        vc = jax.random.randint(k2, (L, B, HKV, S, D), -127, 128, jnp.int8)
        ks = jnp.full((L, B, HKV, S), 0.01, jnp.float32)
        vs = jnp.full((L, B, HKV, S), 0.01, jnp.float32)
        return kc, vc, ks, vs

    kv = make_kv()
    jax.block_until_ready(kv)
    lengths = jnp.full((B,), LIVE, jnp.int32)
    q0 = jax.random.normal(jax.random.fold_in(key, 3), (B, H, D), jnp.bfloat16)

    @jax.jit
    def loop(kv, q):
        kc, vc, ks, vs = kv

        def layer_body(carry, l):
            q, kc, vc, ks, vs = carry
            if APPEND:
                k_new = q[:, :HKV, None, :].astype(jnp.bfloat16)  # (B,Hkv,1,D)
                amax = jnp.max(jnp.abs(k_new.astype(jnp.float32)), axis=-1)
                sc = jnp.maximum(amax / 127.0, 1e-8)  # (B,Hkv,1)
                kq = jnp.clip(
                    jnp.round(k_new.astype(jnp.float32) / sc[..., None]),
                    -127, 127,
                ).astype(jnp.int8)
                kc, vc, ks, vs = kv_append_decode_int8_stacked(
                    kc, vc, ks, vs, kq, kq, sc, sc, lengths, l
                )
            attn = flash_decode_int8_stacked_ragged(
                q, kc, ks, vc, vs, lengths, l
            )
            # data dependence: the attention output feeds the next layer's q
            return (attn.astype(jnp.bfloat16), kc, vc, ks, vs), ()

        def step(carry, _):
            (q2, kc, vc, ks, vs), _ = jax.lax.scan(
                layer_body, carry, jnp.arange(L, dtype=jnp.int32)
            )
            return (q2, kc, vc, ks, vs), ()

        carry, _ = jax.lax.scan(step, (q, kc, vc, ks, vs), None, length=STEPS)
        return carry[0]

    out = loop(kv, q0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(kv, out)  # feedback: no dedup
        np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(
        f"attn loop: batch={B} slab={S} live={LIVE} append={int(APPEND)}: "
        f"{ms:.2f} ms/step ({L} layers)"
    )


if __name__ == "__main__":
    main()
