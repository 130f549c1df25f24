#!/usr/bin/env python
"""Whole-loop GEMV throughput harness (decode-shaped, Llama-8B weights).

Runs a jitted lax.scan over decode steps; each step scans 32 layers of the
four serving matmuls (qkv/o/gateup/down) through `matmul_w4a8_2l_gemv`,
with a data dependence between steps (output rowwise-requantized into the
next step's activations) so the relay cannot dedup work. Whole-loop wall
time only — per CLAUDE.md microbenchmarks through the relay are unreliable.

Weight read per step: ~3.49 GB → v5e roofline ~4.3 ms/step.

Env: GL_BATCH (8), GL_STEPS (32), GL_BLOCK_N (512), FF_2L_CONCAT,
FF_2L_NOFOLD as usual.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.kernels.matmul import (
    matmul_w4a4_2l_gemv_stacked,
    matmul_w4a8_2l_gemv,
    matmul_w4a8_2l_gemv_stacked,
    preblock_stacked,
)
from fastforward_tpu.kernels.packing import pack_mult_nibbles

B = int(os.environ.get("GL_BATCH", "8"))
STACKED = os.environ.get("GL_STACKED", "1") == "1"
STEPS = int(os.environ.get("GL_STEPS", "32"))
BLOCK_N = int(os.environ.get("GL_BLOCK_N", "512"))
L = int(os.environ.get("GL_LAYERS", "32"))
PREBLOCK = os.environ.get("GL_PREBLOCK", "0") == "1"
ONLY = os.environ.get("GL_ONLY", "all")  # all|qkv|gu — per-call-overhead probe
MODE = os.environ.get("GL_MODE", "a8")    # a8|a4 — W4A8 2L vs W4A4 2L kernel
D, QKV_N, INTER = 4096, 6144, 14336
G = int(os.environ.get("GL_GROUP", "128"))

SHAPES = [(D, QKV_N), (D, D), (D, 2 * INTER), (INTER, D)]


@jax.jit
def make_weights():
    """Generate weights on-device (host->relay transfer of GBs is slow)."""
    key = jax.random.PRNGKey(0)
    stacked = []
    for i, (K, N) in enumerate(SHAPES):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        wp = jax.random.randint(k1, (L, K // 2, N), -128, 128, jnp.int8)
        m = jax.random.randint(k2, (L, K // G, N), 1, 16, jnp.int8)
        sc = jax.random.uniform(k3, (L, N), jnp.float32) * 1e-3
        stacked.append((wp, m, sc))
    return tuple(stacked)


def step_fn():
    def requant(y):  # rowwise int8 (a8) / int4 (a4) requantization
        m = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=1, keepdims=True)
        if MODE == "a4":
            s = jnp.maximum(m / 7.0, 1e-8)
            return jnp.clip(jnp.round(y / s), -8, 7).astype(jnp.int8), s[:, 0]
        s = jnp.maximum(m / 127.0, 1e-8)
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8), s[:, 0]

    def layer(carry, per_layer):
        x_q, x_s = carry
        (qkv_w, qkv_m, qkv_s), (o_w, o_m, o_s), (gu_w, gu_m, gu_s), (dn_w, dn_m, dn_s) = per_layer
        qkv = matmul_w4a8_2l_gemv(x_q, x_s, qkv_w, qkv_m, qkv_s, block_n=BLOCK_N)
        a_q, a_s = requant(qkv[:, :D])
        o = matmul_w4a8_2l_gemv(a_q, a_s, o_w, o_m, o_s, block_n=BLOCK_N)
        h_q, h_s = requant(o)
        gu = matmul_w4a8_2l_gemv(h_q, h_s, gu_w, gu_m, gu_s, block_n=BLOCK_N)
        g_q, g_s = requant(gu[:, :INTER])
        dn = matmul_w4a8_2l_gemv(g_q, g_s, dn_w, dn_m, dn_s, block_n=BLOCK_N)
        return requant(dn), None

    def layer_stacked(carry, l, weights):
        # Weights live in the closure; only the layer id rides the scan xs —
        # the scalar-prefetch kernel DMAs panels straight from the stack.
        x_q, x_s = carry
        (qkv_w, qkv_m, qkv_s), (o_w, o_m, o_s), (gu_w, gu_m, gu_s), (dn_w, dn_m, dn_s) = weights
        if MODE == "a4":
            mm = lambda xq, xs, w, m, s: matmul_w4a4_2l_gemv_stacked(
                xq, xs, w, m, s, l, group_size=G, block_n=BLOCK_N
            )
        else:
            mm = lambda xq, xs, w, m, s: matmul_w4a8_2l_gemv_stacked(
                xq, xs, w, m, s, l, group_size=G, block_n=BLOCK_N
            )
        if ONLY == "qkv":  # one 12.6 MB call per layer
            qkv = mm(x_q, x_s, qkv_w, qkv_m, qkv_s)
            return requant(qkv[:, :D]), None
        if ONLY == "gu":   # one 58.7 MB call per layer
            gu = mm(x_q, x_s, gu_w, gu_m, gu_s)
            return requant(gu[:, :D]), None
        qkv = mm(x_q, x_s, qkv_w, qkv_m, qkv_s)
        a_q, a_s = requant(qkv[:, :D])
        o = mm(a_q, a_s, o_w, o_m, o_s)
        h_q, h_s = requant(o)
        gu = mm(h_q, h_s, gu_w, gu_m, gu_s)
        g_q, g_s = requant(gu[:, :INTER])
        dn = mm(g_q, g_s, dn_w, dn_m, dn_s)
        return requant(dn), None

    def loop(weights, x_q, x_s):
        if STACKED:
            ids = jnp.arange(L, dtype=jnp.int32)

            def one_step(carry, _):
                carry, _ = jax.lax.scan(
                    lambda c, l: layer_stacked(c, l, weights), carry, ids
                )
                return carry, None
        else:
            def one_step(carry, _):
                carry, _ = jax.lax.scan(layer, carry, weights)
                return carry, None

        (x_q, x_s), _ = jax.lax.scan(one_step, (x_q, x_s), None, length=STEPS)
        return x_q, x_s

    return jax.jit(loop)


def main():
    weights = make_weights()
    if STACKED:
        weights = tuple(
            (preblock_stacked(wp, BLOCK_N) if PREBLOCK else wp,
             pack_mult_nibbles(m), sc)
            for (wp, m, sc) in weights
        )
    jax.block_until_ready(weights)
    rng = np.random.RandomState(1)
    hi = 8 if MODE == "a4" else 128
    x_q = jnp.asarray(rng.randint(-hi, hi, (B, D)), jnp.int8)
    x_s = jnp.asarray(rng.rand(B).astype(np.float32) * 0.01 + 0.005)
    loop = step_fn()
    out = loop(weights, x_q, x_s)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(weights, x_q, x_s)
        jax.block_until_ready(out)
        np.asarray(out[0][0])
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    per_layer = {"all": 109.1, "qkv": 12.6, "gu": 58.7}[ONLY]
    gbs = per_layer * L / 1e3 / (ms / 1e3)
    print(
        f"mode={MODE} g={G} batch={B} block_n={BLOCK_N} stacked={int(STACKED)} "
        f"preblock={int(PREBLOCK)} only={ONLY}: {ms:.2f} ms/step "
        f"({gbs:.0f} GB/s effective, roofline 819)"
    )


if __name__ == "__main__":
    main()
