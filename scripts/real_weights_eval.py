#!/usr/bin/env python
"""Real-checkpoint end-to-end validation (VERDICT round-1 item 2).

The bench environment has **zero network egress** (verified: DNS resolution
fails), so the reference's anchor checkpoints (Llama-3.2-1B, WikiText-2/C4)
cannot be fetched. This script is the documented substitute: it exercises
the full real-weights pipeline against HuggingFace's OWN implementation as
the golden reference, with a checkpoint in the genuine HF on-disk format:

  1. Fabricate a Llama checkpoint with `transformers.LlamaForCausalLM`
     (torch, CPU) and `save_pretrained(safe_serialization=True)` — real
     config.json + model.safetensors with real HF tensor names.
  2. `serving.loader.load_llama` converts it through the native C++ pack
     kernels into frozen `ServingParams`; logits are compared against the
     torch model's fp32 logits (golden) — validating name mapping,
     transposition, RoPE/GQA/RMSNorm semantics and the quantized kernels
     in one shot.
  3. An eval set is *sampled from the model itself* (so it is low-perplexity
     "natural" data for this model — the stand-in for WikiText), and the
     GPTQ-vs-min-max perplexity comparison of the reference's e2e benchmark
     (`/root/reference/tests/_orchestration/test_gptq_end2end.py:119-179`)
     runs on it: fp32 < GPTQ-W4 < RTN-W4 expected ordering.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/real_weights_eval.py
Env: RW_SIZE=tiny|small (default small), RW_DIR (checkpoint dir).
"""

import json
import os
import tempfile

import numpy as np


def fabricate_hf_checkpoint(out_dir: str, size: str = "small"):
    """Create a real-format HF Llama checkpoint; returns (torch_model, cfg)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    dims = {
        "tiny": dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     vocab_size=256),
        "small": dict(hidden_size=256, intermediate_size=768,
                      num_hidden_layers=4, num_attention_heads=8,
                      num_key_value_heads=4, vocab_size=2048),
    }[size]
    hf_cfg = HFLlamaConfig(
        **dims, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=500000.0, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(0)
    model = HFLlama(hf_cfg)
    model.eval()
    # Scale up output projections a bit so logits have usable dynamic range
    # (default init gives near-uniform logits on random data).
    with torch.no_grad():
        model.lm_head.weight.mul_(3.0)
    model.save_pretrained(out_dir, safe_serialization=True)
    return model, hf_cfg


def our_config(hf_cfg):
    from fastforward_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_key_value_heads,
        head_dim=hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        rope_theta=hf_cfg.rope_theta,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        max_seq_len=hf_cfg.max_position_embeddings,
        tie_embeddings=bool(hf_cfg.tie_word_embeddings),
    )


def torch_logits(model, ids: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(ids)).logits.float().numpy()


def sample_eval_set(model, vocab: int, n_seqs: int, seq_len: int) -> np.ndarray:
    """Sample sequences from the torch model — the model's own 'natural
    language' (low-ppl for it, so quantization-induced ppl deltas are
    meaningful, unlike uniform-random tokens)."""
    import torch

    torch.manual_seed(1)
    prompts = torch.randint(0, vocab, (n_seqs, 4))
    with torch.no_grad():
        out = model.generate(
            prompts, max_new_tokens=seq_len - 4, do_sample=True,
            temperature=0.9, top_k=50, pad_token_id=0,
        )
    return out.numpy()


def ppl_torch(model, ids: np.ndarray) -> float:
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        logits = model(torch.from_numpy(ids)).logits.float()
    lp = F.log_softmax(logits[:, :-1], dim=-1)
    tgt = torch.from_numpy(ids[:, 1:])
    nll = -lp.gather(-1, tgt.unsqueeze(-1)).squeeze(-1)
    return float(nll.mean().exp())


def nnx_model_from_tensors(tensors, config):
    """Load the HF tensors into the NNX sim-tier LlamaForCausalLM."""
    import jax.numpy as jnp
    from flax import nnx

    from fastforward_tpu.models.llama import LlamaForCausalLM

    model = LlamaForCausalLM(
        __import__("dataclasses").replace(config, dtype=jnp.float32),
        rngs=nnx.Rngs(0),
    )

    def t(name):
        key = f"model.{name}" if f"model.{name}" in tensors else name
        return jnp.asarray(np.asarray(tensors[key], np.float32))

    model.embed_tokens.embedding.value = t("embed_tokens.weight")
    model.norm.scale.value = t("norm.weight")
    if model.lm_head is not None:
        model.lm_head.kernel.value = t("lm_head.weight").T
    for i, block in enumerate(model.layers):
        p = f"layers.{i}."
        block.input_layernorm.scale.value = t(p + "input_layernorm.weight")
        block.post_attention_layernorm.scale.value = t(
            p + "post_attention_layernorm.weight"
        )
        a, m = block.self_attn, block.mlp
        a.q_proj.kernel.value = t(p + "self_attn.q_proj.weight").T
        a.k_proj.kernel.value = t(p + "self_attn.k_proj.weight").T
        a.v_proj.kernel.value = t(p + "self_attn.v_proj.weight").T
        a.o_proj.kernel.value = t(p + "self_attn.o_proj.weight").T
        m.gate_proj.kernel.value = t(p + "mlp.gate_proj.weight").T
        m.up_proj.kernel.value = t(p + "mlp.up_proj.weight").T
        m.down_proj.kernel.value = t(p + "mlp.down_proj.weight").T
    return model


def main():
    import jax.numpy as jnp

    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn
    from fastforward_tpu.algorithms import gptq
    from fastforward_tpu.algorithms.layerwise import layerwise_optimize_staged
    from fastforward_tpu.models.llama import LlamaBlock
    from fastforward_tpu.serving.engine import freeze_llama, serving_forward
    from fastforward_tpu.serving.loader import load_llama, load_tensors
    from fastforward_tpu.utils.evaluation import evaluate_perplexity

    size = os.environ.get("RW_SIZE", "small")
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
    eval_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 8, 64)
    calib_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 8, 64)
    ppl_fp = ppl_torch(torch_model, eval_ids)

    print("[4/4] GPTQ vs min-max (RTN) W4 perplexity, reference protocol")
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
        forward=forward, num_bits=4, block_size=64,
    )
    params_gptq = freeze_llama(sim, mode="w4a8", group_size=128)
    ppl_gptq = eval_ppl_exec(params_gptq)

    summary = {
        "checkpoint": out_dir,
        "format": "HF save_pretrained (config.json + model.safetensors)",
        "golden": "transformers.LlamaForCausalLM fp32 (torch CPU)",
        "loader_vs_golden": results,
        "ppl": {"fp32_torch": round(ppl_fp, 3),
                "w4_rtn": round(float(ppl_rtn), 3),
                "w4_gptq": round(float(ppl_gptq), 3)},
        "gptq_beats_rtn": bool(ppl_gptq < ppl_rtn),
    }
    print(json.dumps(summary))
    assert ppl_gptq < ppl_rtn, (ppl_gptq, ppl_rtn)


if __name__ == "__main__":
    main()
