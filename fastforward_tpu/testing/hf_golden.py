"""HF-checkpoint golden-reference fixtures for real-weights regression tests.

The environment has zero network egress, so the reference's anchor
checkpoints (Llama-3.2-1B + WikiText-2, reference
`tests/_orchestration/test_gptq_end2end.py:59-74`) cannot be fetched. The
documented substitute (VERDICT r1 item 2 / r2 item 3): fabricate a
checkpoint in the genuine HF on-disk format with `save_pretrained`, use the
HF torch implementation's fp32 logits as golden, and sample the eval set
from the model itself (low-perplexity "natural" data for that model, so
quantization-induced perplexity deltas are meaningful — uniform-random
tokens are max-entropy and show nothing).

Shared by `scripts/real_weights_eval.py` (CLI) and
`tests/test_real_weights.py` (slow-marked regression suite).
"""

import numpy as np

LLAMA_DIMS = {
    "tiny": dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                 num_attention_heads=4, num_key_value_heads=2,
                 vocab_size=256),
    "small": dict(hidden_size=256, intermediate_size=768,
                  num_hidden_layers=4, num_attention_heads=8,
                  num_key_value_heads=4, vocab_size=2048),
}

GPT2_DIMS = {
    # Scaled-down GPT-2 architecture (BASELINE config 2 names GPT-2-small;
    # the 124M random-init model adds nothing over the same architecture at
    # test scale — there are no pretrained weights without egress).
    "tiny": dict(n_embd=96, n_layer=2, n_head=4, vocab_size=512,
                 n_positions=128),
    "small": dict(n_embd=192, n_layer=4, n_head=8, vocab_size=1024,
                  n_positions=256),
}


def fabricate_hf_checkpoint(out_dir: str, size: str = "small"):
    """Create a real-format HF Llama checkpoint; returns (torch_model, cfg)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFLlamaConfig(
        **LLAMA_DIMS[size], max_position_embeddings=512, rms_norm_eps=1e-5,
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


def fabricate_gpt2_model(size: str = "tiny"):
    """Random-init HF GPT-2 (torch, fp32, eval mode); returns (model, cfg)."""
    import torch
    from transformers import GPT2Config as HFGPT2Config
    from transformers import GPT2LMHeadModel

    hf_cfg = HFGPT2Config(
        **GPT2_DIMS[size], resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(hf_cfg)
    model.eval()
    with torch.no_grad():
        model.lm_head.weight.mul_(3.0)
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


def our_gpt2_config(hf_cfg):
    from fastforward_tpu.models.gpt2 import GPT2Config

    import jax.numpy as jnp

    return GPT2Config(
        vocab_size=hf_cfg.vocab_size,
        max_position_embeddings=hf_cfg.n_positions,
        hidden_size=hf_cfg.n_embd,
        num_layers=hf_cfg.n_layer,
        num_heads=hf_cfg.n_head,
        layer_norm_epsilon=hf_cfg.layer_norm_epsilon,
        dtype=jnp.float32,
    )


def torch_logits(model, ids: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(ids)).logits.float().numpy()


def sample_eval_set(model, vocab: int, n_seqs: int, seq_len: int,
                    seed: int = 1) -> np.ndarray:
    """Sample sequences from the torch model — the model's own 'natural
    language' (low-ppl for it, so quantization-induced ppl deltas are
    meaningful, unlike uniform-random tokens)."""
    import torch

    torch.manual_seed(seed)
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
    import dataclasses

    import jax.numpy as jnp
    from flax import nnx

    from fastforward_tpu.models.llama import LlamaForCausalLM

    model = LlamaForCausalLM(
        dataclasses.replace(config, dtype=jnp.float32), rngs=nnx.Rngs(0)
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


def nnx_gpt2_from_hf(torch_model, config):
    """Load HF GPT-2 weights into the NNX `GPT2LMHead`.

    HF GPT-2 stores matmul weights as `Conv1D` with (in, out) layout — the
    same as nnx.Linear's kernel, so no transposes (unlike Llama).
    """
    import jax.numpy as jnp
    from flax import nnx

    from fastforward_tpu.models.gpt2 import GPT2LMHead

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    def t(name):
        return jnp.asarray(np.asarray(sd[name], np.float32))

    model = GPT2LMHead(config, rngs=nnx.Rngs(0))
    model.wte.embedding.value = t("transformer.wte.weight")
    model.wpe.embedding.value = t("transformer.wpe.weight")
    model.ln_f.scale.value = t("transformer.ln_f.weight")
    model.ln_f.bias.value = t("transformer.ln_f.bias")
    for i, block in enumerate(model.blocks):
        p = f"transformer.h.{i}."
        block.ln_1.scale.value = t(p + "ln_1.weight")
        block.ln_1.bias.value = t(p + "ln_1.bias")
        block.ln_2.scale.value = t(p + "ln_2.weight")
        block.ln_2.bias.value = t(p + "ln_2.bias")
        block.attn.c_attn.kernel.value = t(p + "attn.c_attn.weight")
        block.attn.c_attn.bias.value = t(p + "attn.c_attn.bias")
        block.attn.c_proj.kernel.value = t(p + "attn.c_proj.weight")
        block.attn.c_proj.bias.value = t(p + "attn.c_proj.bias")
        block.fc_in.kernel.value = t(p + "mlp.c_fc.weight")
        block.fc_in.bias.value = t(p + "mlp.c_fc.bias")
        block.fc_out.kernel.value = t(p + "mlp.c_proj.weight")
        block.fc_out.bias.value = t(p + "mlp.c_proj.bias")
    return model


def ppl_jax(forward, ids: np.ndarray) -> float:
    """Perplexity of a logits-returning callable over token ids."""
    import jax.numpy as jnp

    from fastforward_tpu.utils.evaluation import evaluate_perplexity

    return float(evaluate_perplexity(forward, [jnp.asarray(ids)]))
