#!/usr/bin/env python
"""Decompose the decode-step layer-independent fixed cost on real TPU.

Variants ablate one fixed component at a time; every loop keeps the
token->next-step dependence chain so the scan body cannot be hoisted
(docs/performance.md: single-call probes are meaningless).

  full       : embed -> layers -> norm -> lm_head(128k) -> argmax(128k)
  noargmax   : argmax replaced by a sum reduce over the same logits
  smallhead  : lm_head N-sliced to 2048 cols (GEMV + logits + argmax small)
  smallembed : embedding table sliced to 2048 rows (token % 2048 gather)

full - smallhead   = lm_head GEMV + big logits + big argmax cost
full - smallembed  = big-embedding gather cost
full - noargmax    = argmax-vs-sum cost over 128k fp32

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/fixed_cost.py
Env: FF_FC_BATCH (8), FF_FC_STEPS (64), FF_FC_REPEATS (3), FF_FC_VARIANTS,
     FF_FC_MODE (w4a8_2l)
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    fuse_stacked_layers,
    random_stacked_params,
    serving_forward_stacked,
)

SMALL_N = 2048


def slice_head(ql, n):
    kw = dict(data=ql.data[:, :n], scale=ql.scale[..., :n])
    if ql.mult is not None:
        kw["mult"] = ql.mult[:, :n]
    if ql.mult_packed is not None:
        kw["mult_packed"] = ql.mult_packed[..., :n]
    return dataclasses.replace(ql, **kw)


def build_loop(config, params, stacked, variant, num_steps):
    if variant == "smallhead":
        params = dataclasses.replace(params, lm_head=slice_head(params.lm_head, SMALL_N))
    elif variant == "smallembed":
        params = dataclasses.replace(params, embedding=params.embedding[:SMALL_N])

    def loop(params, stacked_layers, cache, token):
        def step(carry, _):
            cache, token = carry
            tok_in = token % SMALL_N if variant == "smallembed" else token
            logits, cache = serving_forward_stacked(
                params, stacked_layers, config, tok_in, cache
            )
            if variant == "noargmax":
                nxt = (jnp.sum(logits[:, -1], axis=-1).astype(jnp.int32)
                       % 1000).astype(token.dtype)[:, None]
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(token.dtype)[:, None]
            return (cache, nxt), nxt[:, 0]

        (cache, _), tokens = jax.lax.scan(step, (cache, token), None,
                                          length=num_steps)
        return tokens.T, cache

    jitted = jax.jit(loop, donate_argnums=(2,))
    return jitted, params


def main():
    config = LlamaConfig.llama3_8b()
    batch = int(os.environ.get("FF_FC_BATCH", "8"))
    steps = int(os.environ.get("FF_FC_STEPS", "64"))
    repeats = int(os.environ.get("FF_FC_REPEATS", "3"))
    max_len = 512

    mode = os.environ.get("FF_FC_MODE", "w4a8_2l")
    base_params, stacked = random_stacked_params(config, mode=mode, seed=0)
    stacked = fuse_stacked_layers(stacked)
    variants = os.environ.get(
        "FF_FC_VARIANTS", "full,noargmax,smallhead,smallembed").split(",")
    loops = {v: build_loop(config, base_params, stacked, v, steps)
             for v in variants}
    results = {v: [] for v in variants}

    for rep in range(repeats):
        for v in variants:
            fn, params = loops[v]
            cache = StackedKVCache.create(
                num_layers=config.num_layers, batch_size=batch,
                max_len=max_len, num_kv_heads=config.num_kv_heads,
                head_dim=config.head_dim, quantized=True)
            token = jnp.ones((batch, 1), jnp.int32)
            toks, cache = fn(params, stacked, cache, token)
            np.asarray(toks[0, -1])  # full sync through the relay
            t0 = time.perf_counter()
            toks, cache = fn(params, stacked, cache, token)
            np.asarray(toks[0, -1])
            ms = (time.perf_counter() - t0) / steps * 1e3
            results[v].append(ms)
            print(f"rep{rep} {v:10s}: {ms:.3f} ms/step", flush=True)

    print()
    med = {v: float(np.median(results[v])) for v in variants}
    for v in variants:
        print(f"{v:10s} median {med[v]:.3f} ms/step")
    if "full" in med:
        for v in variants:
            if v != "full":
                print(f"full - {v:10s} = {med['full'] - med[v]:+.3f} ms/step")


if __name__ == "__main__":
    main()
