#!/usr/bin/env python
"""Headline benchmark: Llama-3-8B W4A8 + INT8 KV-cache decode throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

- value: greedy-decode tokens/s/chip for Llama-3-8B (random weights), W4A8
  per-group g=128 weights + INT8 KV cache, batch FF_BENCH_BATCH (default 32),
  decode loop fully jitted (lax.scan over steps, lax.scan over layers).
- vs_baseline: speedup over the *reference-equivalent* path — fake-quant
  simulation (bf16 weights QDQ'd per use, exactly FastForward's execution
  model, reference `_quantizer_impl.py:144-190`) — measured on the largest
  Llama that fits in bf16 on one chip (Llama-3.2-1B), same batch/steps:
      vs_baseline = (our W4A8 tok/s at 1B) / (sim-tier tok/s at 1B).
  The reference itself could not run 8B on this 16GB chip at all (bf16
  weights alone exceed HBM).

Env overrides: FF_BENCH_MODEL=8b|1b|tiny, FF_BENCH_MODE=w4a8|w4a16|w8a8,
FF_BENCH_BATCH, FF_BENCH_STEPS, FF_BENCH_PREFILL, FF_BENCH_SKIP_BASELINE=1,
FF_BENCH_FUSED=0|1 (fused QKV/gate-up projections, default on).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _default_group(mode: str) -> int:
    # A4's dot-issue-bound kernel wants the 512-deep int4 dots; every other
    # mode keeps the standard g=128 weight grids.
    return 512 if mode == "w4a4_2l" else 128


def _build(config, mode, batch, max_len, prefill_len, steps, seed=0):
    from fastforward_tpu.serving.stacked import (
        StackedKVCache,
        make_stacked_decode_loop,
        random_stacked_params,
        serving_forward_stacked,
    )

    group = int(os.environ.get("FF_BENCH_GROUP", str(_default_group(mode))))
    params, stacked = random_stacked_params(
        config, mode=mode, seed=seed, group_size=group
    )
    if os.environ.get("FF_BENCH_FUSED", "1") == "1" and not mode.startswith("sim"):
        from fastforward_tpu.serving.stacked import fuse_stacked_layers

        stacked = fuse_stacked_layers(stacked)
    cache = StackedKVCache.create(
        num_layers=config.num_layers, batch_size=batch, max_len=max_len,
        num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
        quantized=True,
    )
    # Donate the cache: without it prefill holds input AND output slabs
    # alive simultaneously (2 x 5.5 GiB at batch 160) — the allocation that
    # capped the r3 batch ceiling at 128.
    prefill = jax.jit(
        lambda p, s, c, ids: serving_forward_stacked(
            p, s, config, ids, cache=c, logits_positions="last"
        ),
        donate_argnums=(2,),
    )
    loop = make_stacked_decode_loop(config, num_steps=steps)
    return params, stacked, cache, prefill, loop


def measure_decode(config, mode, batch, prefill_len, steps, seed=0, repeats=2):
    """Return decode tokens/s (batch*steps / loop wall time, best of repeats)."""
    # Round the cache up to a multiple of 256 so the flash-decode kernel's
    # sequence blocking divides it evenly. FF_BENCH_MAXLEN overrides — e.g.
    # a 2k/8k serving bucket with short live lengths, the regime where
    # length-aware attention (FF_FLASH_RAGGED) pays.
    max_len = prefill_len + steps * (repeats + 2) + 8
    max_len = ((max_len + 255) // 256) * 256
    max_len = max(max_len, int(os.environ.get("FF_BENCH_MAXLEN", "0")))
    params, stacked, cache, prefill, loop = _build(
        config, mode, batch, max_len, prefill_len, steps, seed
    )
    ids = jnp.asarray(np.random.RandomState(0).randint(0, config.vocab_size, (batch, prefill_len)))
    t_c0 = time.perf_counter()
    logits, cache = prefill(params, stacked, cache, ids)
    token = jnp.argmax(logits[:, -1], axis=-1).astype(ids.dtype)[:, None]

    # Warmup compiles the loop and runs it once. Compile seconds recorded
    # per config (VERDICT r3 weak #8 / r4 weak #6): first-compile of new
    # kernel shapes costs minutes through the remote compile relay and a
    # regression here (e.g. an accidental bucketed-switch blowup) should be
    # visible, not folklore. Soft budget: warm cache <60 s, cold <2,500 s.
    tokens, cache = loop(params, stacked, cache, token)
    tokens.block_until_ready()
    compile_s = time.perf_counter() - t_c0
    print(
        f"COMPILE {json.dumps(dict(mode=mode, batch=batch, model=config.num_layers, warmup_seconds=round(compile_s, 1)))}",
        file=sys.stderr,
    )
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        tokens, cache = loop(params, stacked, cache, token)
        tokens.block_until_ready()
        np.asarray(tokens[0, -1])  # force full sync through the relay
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def measure_engine(config, mode, batch, steps, seed=0):
    """Mixed-arrival continuous-batching throughput: staggered request
    admission (new request each ~8 steps) with heterogeneous lengths;
    returns generated tokens/s of wall time over the full engine loop
    (admissions + prefills + decode interleaved). FF_BENCH_ENGINE=1."""
    from fastforward_tpu.serving.batching import ContinuousBatchingEngine
    from fastforward_tpu.serving.stacked import (
        fuse_stacked_layers,
        random_stacked_params,
    )

    group = int(os.environ.get("FF_BENCH_GROUP", str(_default_group(mode))))
    params, stacked = random_stacked_params(
        config, mode=mode, seed=seed, group_size=group
    )
    if os.environ.get("FF_BENCH_FUSED", "1") == "1" and not mode.startswith("sim"):
        stacked = fuse_stacked_layers(stacked)
    # FF_BENCH_ENGINE_PAGED=1: run the whole admission->decode lifecycle on
    # the page pool (pages for live tokens only; pool sized to ~60% of the
    # slab equivalent to exercise allocation pressure).
    paged = os.environ.get("FF_BENCH_ENGINE_PAGED") == "1"
    kw = {}
    if paged:
        kw = dict(paged=True, page_size=256,
                  num_pages=int(batch * 2 * 0.6) + 1)
    max_len = int(os.environ.get("FF_BENCH_ENGINE_MAXLEN", "512"))
    engine = ContinuousBatchingEngine(
        config, params, stacked, max_batch=batch, max_len=max_len, **kw,
    )
    rng = np.random.RandomState(0)
    # FF_BENCH_ENGINE_PROMPTS: comma-separated prompt-length choices —
    # e.g. "4096" with FF_BENCH_ENGINE_MAXLEN=8192 proves the long-context
    # claim that chunked-prefill admission avoids the single-shot bench's
    # prefill-temporary OOM (docs/performance.md "Long-context decode").
    plens = [int(v) for v in os.environ.get(
        "FF_BENCH_ENGINE_PROMPTS", "16,32,64,96").split(",")]
    arrivals = []
    for i in range(batch * 2):
        plen = int(rng.choice(plens))
        arrivals.append(rng.randint(0, config.vocab_size, (plen,)).tolist())

    burst = int(os.environ.get("FF_BENCH_ENGINE_BURST", "8"))
    # warmup: compile EVERY prefill bucket (one request per distinct prompt
    # length) and the decode burst — through the remote relay each compile
    # costs tens of seconds and must not land in the measured loop.
    for plen in sorted(set(plens)):
        engine.submit(rng.randint(0, config.vocab_size, (plen,)).tolist(),
                      max_new_tokens=burst)
        engine.run_until_complete(burst=burst)
    warm = sum(len(r.generated) for r in engine._done.values())

    from fastforward_tpu.serving.batching import EngineStats

    engine.stats = EngineStats()  # measured loop only (warmup excluded)
    # FF_BENCH_ENGINE_SAT=1: all requests queued upfront — measures the
    # scheduler at saturation (slot occupancy under full load) instead of
    # the default trickle trace (one arrival per burst window), which is
    # admission-limited by construction (occupancy ~= a few slots).
    saturated = os.environ.get("FF_BENCH_ENGINE_SAT") == "1"

    def run_trace(trace):
        t0 = time.perf_counter()
        submitted = 0
        while submitted < len(trace) or engine.num_active or engine._pending:
            take = len(trace) - submitted if saturated else min(
                1, len(trace) - submitted
            )
            for _ in range(take):
                engine.submit(trace[submitted], max_new_tokens=steps)
                submitted += 1
            engine.step_burst(burst)
        return time.perf_counter() - t0

    # Pass 1 compiles every admission-group bucket shape the trace produces
    # (nb x t_bucket prefill programs); pass 2 is the measured loop.
    # FF_BENCH_ENGINE_COLD=1 keeps the old single-pass (compile-included)
    # behavior.
    if os.environ.get("FF_BENCH_ENGINE_COLD") != "1":
        run_trace(arrivals)
        warm = sum(len(r.generated) for r in engine._done.values())
        engine.stats = EngineStats()
    dt = run_trace(list(arrivals))
    total = sum(len(r.generated) for r in engine._done.values()) - warm
    st = engine.stats
    # Relay-independent scheduling metrics (VERDICT r3 weak item 3): the
    # end-to-end tok/s through a remote relay measures the relay; these
    # quantify the scheduler itself. Printed to stderr to keep the
    # one-JSON-line stdout contract.
    print(
        json.dumps({
            "engine_stats": {
                "occupancy": round(st.occupancy, 4),
                "decode_steps": st.decode_steps,
                "decode_calls": st.decode_calls,
                "useful_tokens": st.useful_tokens,
                "overrun_tokens": st.overrun_tokens,
                "prefills": st.prefills,
                "prefill_chunks": st.prefill_chunks,
                "admitted": st.admitted,
                "preempt_truncated": st.preempt_truncated,
                "preempt_requeued": st.preempt_requeued,
                "device_seconds": round(st.device_seconds, 3),
                "wall_seconds": round(dt, 3),
                "host_fraction": round(1 - st.device_seconds / dt, 4),
            }
        }),
        file=sys.stderr,
    )
    return total / dt


def main():
    model = os.environ.get("FF_BENCH_MODEL", "8b")
    # Default serving format: two-level W4A8 (per-group integer multipliers
    # on a per-column int8 grid — QServe-style progressive quantization).
    # One whole-group MXU dot per N-panel instead of two small per-group
    # dots; measured 422 → 466 tok/s (batch 8) / 843 → 923 (batch 32) on
    # Llama-3-8B vs the float-per-group-scale kernel.
    # r5 default: W4A4 two-level at group 512 — the int4-MXU GEMV with the
    # fused A4 layer head measures 9,000-9,240 tok/s/chip at batch 192 vs
    # 8,300-8,510 for W4A8 (interleaved A/B pairs; accuracy trade recorded
    # in docs/accuracy.md, lm_head stays W4A8). FF_BENCH_MODE=w4a8_2l
    # restores the A8 headline.
    mode = os.environ.get("FF_BENCH_MODE", "w4a4_2l")
    # Default batch 192: decode throughput scales near-linearly with batch
    # (the weight-streaming GEMV panel traffic is M-independent) — 3,100 ->
    # 6,700 -> 8,100 tok/s/chip going 32 -> 128 -> 192. Batches above 128
    # were unlocked in r4 by the stacked-carry prefill (the slab-prefill
    # xs/ys temporaries were the OOM) + the GEMV M ceiling at 256; scaling
    # saturates at 192 (224 measured flat). See docs/performance.md.
    batch = int(os.environ.get("FF_BENCH_BATCH", "192"))
    steps = int(os.environ.get("FF_BENCH_STEPS", "32"))
    prefill_len = int(os.environ.get("FF_BENCH_PREFILL", "128"))

    from fastforward_tpu.models.llama import LlamaConfig

    configs = {
        "8b": LlamaConfig.llama3_8b(),
        "1b": LlamaConfig.llama32_1b(),
        "tiny": LlamaConfig.tiny(),
    }
    config = configs[model]
    if os.environ.get("FF_BENCH_LAYERS"):
        import dataclasses

        config = dataclasses.replace(
            config, num_layers=int(os.environ["FF_BENCH_LAYERS"])
        )

    if os.environ.get("FF_BENCH_ENGINE") == "1":
        tok_s = measure_engine(config, mode, batch, steps)
        result = {
            "metric": (
                f"engine tokens/s under mixed arrivals Llama-3-{model.upper()} "
                f"{mode.upper()} + INT8 KV (max_batch={batch})"
            ),
            "value": round(tok_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        return

    tok_s = measure_decode(config, mode, batch, prefill_len, steps)

    vs_baseline = None
    if os.environ.get("FF_BENCH_SKIP_BASELINE") != "1":
        # Baseline: reference-equivalent fake-quant simulation at 1B (largest
        # that fits in bf16), same decode protocol.
        base_config = configs["1b"] if model != "tiny" else configs["tiny"]
        sim_mode = "sim_w4" if mode.startswith("w4") else "sim_w8"
        try:
            sim_tok_s = measure_decode(base_config, sim_mode, batch, prefill_len, steps)
            ours_at_base = (
                tok_s if model in ("1b", "tiny")
                else measure_decode(base_config, mode, batch, prefill_len, steps)
            )
            vs_baseline = ours_at_base / sim_tok_s
        except Exception as e:  # noqa: BLE001
            print(f"baseline measurement failed: {e}", file=sys.stderr)

    # Small-batch sidecar (VERDICT r4 weak #2): the headline compresses the
    # kernel advantage at large batch (both tiers attention-bound); pin a
    # second regression point at batch 32 where the execution tier's win is
    # ~1.5x, with a hard bound — a kernel regression at small batch now
    # fails visibly instead of hiding inside the headline. Written to
    # stderr + BENCH_sidecar.json; stdout stays the one-JSON-line contract.
    if os.environ.get("FF_BENCH_SIDECAR", "1") == "1" and model == "8b":
        try:
            side_tok = measure_decode(config, mode, 32, prefill_len, steps)
            base_config = configs["1b"]
            sim_mode = "sim_w4" if mode.startswith("w4") else "sim_w8"
            side_ours_1b = measure_decode(base_config, mode, 32, prefill_len, steps)
            side_sim = measure_decode(base_config, sim_mode, 32, prefill_len, steps)
            side_vs = side_ours_1b / side_sim
            sidecar = {
                "metric": f"decode tokens/s/chip 8B {mode.upper()} (batch=32)",
                "value": round(side_tok, 2),
                "vs_baseline": round(side_vs, 3),
                "bound": 1.4,
                "bound_ok": bool(side_vs >= 1.4),
            }
            print("SIDECAR " + json.dumps(sidecar), file=sys.stderr)
            with open("BENCH_sidecar.json", "w") as f:
                json.dump(sidecar, f)
        except Exception as e:  # noqa: BLE001
            print(f"sidecar measurement failed: {e}", file=sys.stderr)

    result = {
        "metric": f"decode tokens/s/chip Llama-3-{model.upper()} {mode.upper()} + INT8 KV (batch={batch})",
        "value": round(tok_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
