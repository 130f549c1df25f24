#!/usr/bin/env python
"""Real-checkpoint end-to-end validation (VERDICT round-1 item 2).

The bench environment has **zero network egress** (verified: DNS resolution
fails), so the reference's anchor checkpoints (Llama-3.2-1B, WikiText-2/C4)
cannot be fetched. This CLI is the documented substitute; the shared
fixtures live in `fastforward_tpu/testing/hf_golden.py` and the same checks
run as a slow-marked regression suite (`tests/test_real_weights.py`,
`pytest --include-slow`):

  1. Fabricate a Llama checkpoint with `transformers.LlamaForCausalLM`
     (torch, CPU) and `save_pretrained(safe_serialization=True)` — real
     config.json + model.safetensors with real HF tensor names.
  2. `serving.loader.load_llama` converts it through the native C++ pack
     kernels into frozen `ServingParams`; logits are compared against the
     torch model's fp32 logits (golden) — validating name mapping,
     transposition, RoPE/GQA/RMSNorm semantics and the quantized kernels
     in one shot.
  3. An eval set is *sampled from the model itself* (low-perplexity
     "natural" data for this model — the stand-in for WikiText), and the
     GPTQ-vs-min-max perplexity comparison of the reference's e2e benchmark
     (`/root/reference/tests/_orchestration/test_gptq_end2end.py:119-179`)
     runs on it: fp32 < GPTQ-W4 < RTN-W4 expected ordering.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/real_weights_eval.py
Env: RW_SIZE=tiny|small (default small), RW_DIR (checkpoint dir),
     RW_ACT_ORDER=1 (GPTQ act-order column permutation).
"""

import json
import os
import tempfile

import numpy as np

from fastforward_tpu.testing.hf_golden import (
    fabricate_hf_checkpoint,
    our_config,
    ppl_torch,
    sample_eval_set,
    torch_logits,
)


def main():
    import jax.numpy as jnp

    import fastforward_tpu as ff  # noqa: F401 (registers dispatch tables)
    from fastforward_tpu import nn as ffnn
    from fastforward_tpu.algorithms import gptq
    from fastforward_tpu.algorithms.layerwise import layerwise_optimize_staged
    from fastforward_tpu.models.llama import LlamaBlock
    from fastforward_tpu.serving.engine import freeze_llama, serving_forward
    from fastforward_tpu.serving.loader import load_llama, load_tensors
    from fastforward_tpu.testing.hf_golden import nnx_model_from_tensors
    from fastforward_tpu.utils.evaluation import evaluate_perplexity

    size = os.environ.get("RW_SIZE", "small")
    act_order = os.environ.get("RW_ACT_ORDER", "0") == "1"
    out_dir = os.environ.get("RW_DIR") or tempfile.mkdtemp(prefix="hf_llama_")
    print(f"[1/4] fabricating HF checkpoint ({size}) at {out_dir}")
    torch_model, hf_cfg = fabricate_hf_checkpoint(out_dir, size)
    config = our_config(hf_cfg)
    assert os.path.exists(os.path.join(out_dir, "config.json"))

    rng = np.random.RandomState(0)
    ids = rng.randint(0, hf_cfg.vocab_size, (2, 64)).astype(np.int64)
    golden = torch_logits(torch_model, ids)

    print("[2/4] loader → frozen engine vs HF golden logits")
    results = {}
    for mode in ("w8a8", "w4a8"):
        params = load_llama(out_dir, config, mode=mode)
        logits, _ = serving_forward(params, config, jnp.asarray(ids))
        ours = np.asarray(logits, np.float32)
        top1 = (ours.argmax(-1) == golden.argmax(-1)).mean()
        err = np.abs(ours - golden).max() / (np.abs(golden).max() + 1e-9)
        sq = 10 * np.log10(
            (golden ** 2).mean() / ((ours - golden) ** 2).mean()
        )
        results[mode] = dict(top1=float(top1), rel_err=float(err),
                             sqnr_db=float(sq))
        print(f"  {mode}: top1 agree {top1:.3f}, sqnr {sq:.1f} dB")
    # Random-init weights give near-flat logit distributions, so top-1 is a
    # brittle metric; SQNR is the meaningful one (w8a8 ≈ 30 dB measured).
    assert results["w8a8"]["top1"] > 0.9, results
    assert results["w8a8"]["sqnr_db"] > 20, results

    print("[3/4] sampling model-natural eval/calibration set")
    eval_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 8, 64, seed=1)
    n_calib = int(os.environ.get("RW_CALIB_SEQS", "32"))
    calib_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, n_calib, 64, seed=2)
    ppl_fp = ppl_torch(torch_model, eval_ids)

    print(f"[4/4] GPTQ (act_order={act_order}) vs min-max (RTN) W4 perplexity")
    tensors = load_tensors(out_dir)

    def eval_ppl_exec(params):
        def fwd(b):
            logits, _ = serving_forward(params, config, b)
            return logits
        return evaluate_perplexity(fwd, [jnp.asarray(eval_ids)])

    # RTN: straight per-group min-max quantization of the checkpoint.
    ppl_rtn = eval_ppl_exec(load_llama(out_dir, config, mode="w4a8"))

    # GPTQ: sim-tier model → staged layerwise GPTQ on calibration data →
    # freeze with the optimized scales carried into the execution tier.
    sim = nnx_model_from_tensors(tensors, config)
    ffnn.quantize_model(sim)

    def forward(model, batch):
        logits, _ = model(batch)
        return logits

    layerwise_optimize_staged(
        sim, [jnp.asarray(calib_ids)], gptq,
        stages="**/[cls:LlamaBlock]", context={"LlamaBlock": LlamaBlock},
        forward=forward, num_bits=4, block_size=64, act_order=act_order,
    )
    params_gptq = freeze_llama(sim, mode="w4a8", group_size=128)
    ppl_gptq = eval_ppl_exec(params_gptq)

    summary = {
        "checkpoint": out_dir,
        "format": "HF save_pretrained (config.json + model.safetensors)",
        "golden": "transformers.LlamaForCausalLM fp32 (torch CPU)",
        "loader_vs_golden": results,
        "act_order": act_order,
        "ppl": {"fp32_torch": round(ppl_fp, 3),
                "w4_rtn": round(float(ppl_rtn), 3),
                "w4_gptq": round(float(ppl_gptq), 3)},
        "gptq_beats_rtn": bool(ppl_gptq < ppl_rtn),
    }
    print(json.dumps(summary))
    assert ppl_gptq < ppl_rtn, (ppl_gptq, ppl_rtn)


if __name__ == "__main__":
    main()
