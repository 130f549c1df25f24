"""Checkpoint loader tests with a synthetic HF-layout safetensors file."""

import numpy as np
import pytest
from safetensors.numpy import save_file

import jax.numpy as jnp

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.loader import load_llama
from fastforward_tpu.serving.engine import serving_forward


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    config = LlamaConfig.tiny()
    rng = np.random.RandomState(0)
    h, inter, d = config.hidden_size, config.intermediate_size, config.head_dim
    nh, nkv = config.num_heads, config.num_kv_heads

    tensors = {
        "model.embed_tokens.weight": rng.randn(config.vocab_size, h).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones((h,), np.float32),
        "lm_head.weight": rng.randn(config.vocab_size, h).astype(np.float32) * 0.02,
    }
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = rng.randn(nh * d, h).astype(np.float32) * 0.05
        tensors[p + "self_attn.k_proj.weight"] = rng.randn(nkv * d, h).astype(np.float32) * 0.05
        tensors[p + "self_attn.v_proj.weight"] = rng.randn(nkv * d, h).astype(np.float32) * 0.05
        tensors[p + "self_attn.o_proj.weight"] = rng.randn(h, nh * d).astype(np.float32) * 0.05
        tensors[p + "mlp.gate_proj.weight"] = rng.randn(inter, h).astype(np.float32) * 0.05
        tensors[p + "mlp.up_proj.weight"] = rng.randn(inter, h).astype(np.float32) * 0.05
        tensors[p + "mlp.down_proj.weight"] = rng.randn(h, inter).astype(np.float32) * 0.05
        tensors[p + "input_layernorm.weight"] = np.ones((h,), np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones((h,), np.float32)

    path = tmp_path_factory.mktemp("ckpt") / "model.safetensors"
    save_file(tensors, str(path))
    return config, str(path), tensors


@pytest.mark.parametrize("mode", ["w8a8", "w4a8"])
def test_load_llama_runs(checkpoint, mode):
    config, path, tensors = checkpoint
    params = load_llama(path, config, mode=mode)
    assert len(params.layers) == config.num_layers
    ids = jnp.asarray(np.random.RandomState(1).randint(0, config.vocab_size, (1, 6)))
    logits, _ = serving_forward(params, config, ids)
    assert logits.shape == (1, 6, config.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_loaded_weights_quantize_faithfully(checkpoint):
    config, path, tensors = checkpoint
    params = load_llama(path, config, mode="w8a8")
    # q_proj dequantizes back to ~the original (HF transpose applied)
    w_hf = tensors["model.layers.0.self_attn.q_proj.weight"].T  # (in, out)
    ql = params.layers[0].q_proj
    dq = np.asarray(ql.data, np.float32) * np.asarray(ql.scale)[None, :]
    err = np.abs(dq - w_hf)
    assert (err <= np.asarray(ql.scale)[None, :] / 2 + 1e-6).all()
