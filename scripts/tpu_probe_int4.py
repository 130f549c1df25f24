#!/usr/bin/env python
"""Probe: does the TPU MXU run int4xint4 dots faster than int8xint8?

Decision gate for the W4A4 GEMV (VERDICT r4 item 2). The two-level W4A8
GEMV at batch 192 is MXU-compute-bound (11.77 ms vs 6.8 ms int8 spec
floor, docs/performance.md "GEMV loop at large batch"); an A4 path only
pays if int4 dots run faster than int8 on this part.

First finding (qualitative, earlier run): Mosaic LOWERS int4 x int4
`lax.dot`; int8 x int4 mixed fails remote compile (HTTP 500).

Method: wall-time-scale workload (relay microbenchmarks are unreliable —
CLAUDE.md): each kernel call runs ROUNDS serial rounds; a round issues
PANELS independent (bm x K) @ (K x N) dots against distinct VMEM weight
panels (pipeline-filling), and the round's last accumulator feeds the
next round's activations (serial dependence). Kernel calls chain through
a lax.scan carry AND rep-to-rep feedback. int8 and int4 reps interleave
(relay throughput drifts +-5% in-session).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_int4.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = int(os.environ.get("P4_BM", "192"))
K = int(os.environ.get("P4_K", "512"))
N = int(os.environ.get("P4_N", "512"))
PANELS = int(os.environ.get("P4_PANELS", "6"))
ROUNDS = int(os.environ.get("P4_ROUNDS", "16"))
SCAN = int(os.environ.get("P4_SCAN", "2000"))
PAIRS = int(os.environ.get("P4_PAIRS", "3"))

assert N == K, "feedback chaining needs N == K"


def _kernel(x_ref, w_ref, out_ref, *, int4: bool):
    x = x_ref[:]  # (BM, K) int8 in [0, 15]
    if int4:
        x = x.astype(jnp.int4)
    for r in range(ROUNDS):
        acc = jnp.zeros((BM, N), jnp.int32)
        for p in range(PANELS):
            w = w_ref[p]
            if int4:
                w = w.astype(jnp.int4)
            acc = acc + jax.lax.dot(x, w, preferred_element_type=jnp.int32)
        # Serial dependence between rounds: the accumulator becomes the next
        # round's activation (bytes kept in [0, 15]).
        x = jnp.bitwise_and(acc + r, 0x0F).astype(jnp.int8)
        if int4:
            x = x.astype(jnp.int4)
    out_ref[:] = x.astype(jnp.int8)


def make_probe(int4: bool):
    kern = functools.partial(_kernel, int4=int4)

    def one(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BM, K), jnp.int8),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    @jax.jit
    def loop(x, w):
        def body(carry, _):
            return one(carry, w), ()

        y, _ = jax.lax.scan(body, x, None, length=SCAN)
        return y

    return loop


def main():
    print(f"devices: {jax.devices()}")
    total_macs = BM * K * N * PANELS * ROUNDS * SCAN
    print(
        f"({BM},{K})@({K},{N}) x {PANELS} panels x {ROUNDS} rounds x "
        f"{SCAN} scan = {2 * total_macs / 1e12:.1f} TOP per call"
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 16, (BM, K)), jnp.int8)
    w = jnp.asarray(rng.randint(-8, 8, (PANELS, K, N)), jnp.int8)

    p8 = make_probe(False)
    p4 = make_probe(True)
    try:
        y8 = p8(x, w)
        np.asarray(y8)
    except Exception as e:
        print(f"int8 FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    try:
        y4 = p4(x, w)
        np.asarray(y4)
    except Exception as e:
        print(f"int4 FAILED: {type(e).__name__}: {str(e)[:200]}")
        return

    t8s, t4s = [], []
    for i in range(PAIRS):
        t0 = time.perf_counter()
        y8 = p8(y8, w)
        np.asarray(y8)  # device_get: the relay's block_until_ready is lazy
        t8s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        y4 = p4(y4, w)
        np.asarray(y4)
        t4s.append(time.perf_counter() - t0)
        print(
            f"pair {i}: int8 {t8s[-1] * 1e3:8.1f} ms "
            f"({2 * total_macs / t8s[-1] / 1e12:6.1f} TOP/s)   "
            f"int4 {t4s[-1] * 1e3:8.1f} ms "
            f"({2 * total_macs / t4s[-1] / 1e12:6.1f} TOP/s)"
        )
    b8, b4 = min(t8s), min(t4s)
    print(
        f"best: int8 {b8 * 1e3:.1f} ms ({2 * total_macs / b8 / 1e12:.1f} TOP/s)"
        f"  int4 {b4 * 1e3:.1f} ms ({2 * total_macs / b4 / 1e12:.1f} TOP/s)"
        f"  speedup x{b8 / b4:.2f}"
    )


if __name__ == "__main__":
    main()
