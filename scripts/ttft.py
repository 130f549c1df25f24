#!/usr/bin/env python
"""Time-to-first-token tracking (BASELINE.md: "p50 TTFT tracked per config").

Measures wall time of one jitted prefill (prompt -> first-token logits,
cache populated) on the serving engine, p50 over repeats, per prompt
length. Prints one JSON line:

  {"metric": "p50 TTFT Llama-3-8B W4A8_2L", "points": {"128": ms, ...}}

Env: TTFT_MODEL=8b|1b|tiny, TTFT_MODE, TTFT_BATCH, TTFT_LENS=128,512,1024,
TTFT_REPEATS=5.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastforward_tpu.models.llama import LlamaConfig
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        fuse_stacked_layers,
        random_stacked_params,
        serving_forward_stacked,
    )

    model = os.environ.get("TTFT_MODEL", "8b")
    mode = os.environ.get("TTFT_MODE", "w4a8_2l")
    group = int(os.environ.get(
        "TTFT_GROUP", "512" if mode == "w4a4_2l" else "128"
    ))
    batch = int(os.environ.get("TTFT_BATCH", "1"))
    lens = [int(s) for s in os.environ.get("TTFT_LENS", "128,512,1024").split(",")]
    repeats = int(os.environ.get("TTFT_REPEATS", "5"))

    config = {
        "8b": LlamaConfig.llama3_8b(),
        "1b": LlamaConfig.llama32_1b(),
        "tiny": LlamaConfig.tiny(),
    }[model]

    params, stacked = random_stacked_params(config, mode=mode, group_size=group, seed=0)
    if not mode.startswith("sim"):
        stacked = fuse_stacked_layers(stacked)

    max_len = ((max(lens) + 256) // 256 + 1) * 256
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=batch, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    prefill = jax.jit(
        lambda p, s, c, ids: serving_forward_stacked(
            p, s, config, ids, cache=c, logits_positions="last"
        )
    )

    points = {}
    for plen in lens:
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, config.vocab_size, (batch, plen))
        )
        logits, new_cache = prefill(params, stacked, cache, ids)  # compile+warm
        jax.block_until_ready(logits)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            logits, new_cache = prefill(params, stacked, cache, ids)
            jax.block_until_ready(logits)
            np.asarray(logits[0, -1, 0])
            times.append((time.perf_counter() - t0) * 1e3)
        points[str(plen)] = round(float(np.percentile(times, 50)), 2)

    print(json.dumps({
        "metric": f"p50 TTFT Llama-3-{model.upper()} {mode.upper()} (batch={batch})",
        "unit": "ms",
        "points": points,
    }))


if __name__ == "__main__":
    main()
