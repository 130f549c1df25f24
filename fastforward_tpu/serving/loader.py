"""Checkpoint loading: HF-layout Llama safetensors → frozen serving params.

Maps the HuggingFace Llama parameter names onto `ServingParams`, quantizing
each weight on the host through the native C++ kernels
(`fastforward_tpu.native`) so an 8B checkpoint converts at host memory
bandwidth, then transfers only the low-bit buffers to the device.

HF stores linear weights as (out, in); our layout is (in, out) — transposed
on load.
"""

import os
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from fastforward_tpu import native
from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.engine import QuantLinear, ServingLayer, ServingParams


def _iter_safetensor_files(path: str) -> Iterator[str]:
    if os.path.isfile(path):
        yield path
        return
    for name in sorted(os.listdir(path)):
        if name.endswith(".safetensors"):
            yield os.path.join(path, name)


def load_tensors(path: str) -> dict[str, np.ndarray]:
    """Load all tensors from a safetensors file or directory of shards."""
    from safetensors.numpy import load_file

    tensors: dict[str, np.ndarray] = {}
    for file in _iter_safetensor_files(path):
        tensors.update(load_file(file))
    if not tensors:
        raise FileNotFoundError(f"no safetensors found at {path}")
    return tensors


def _quantize(w: np.ndarray, mode: str, group_size: int) -> QuantLinear:
    """Host-side quantization of an (in, out) weight via the native kernels."""
    w = np.ascontiguousarray(w, dtype=np.float32)
    K = w.shape[0]
    if mode == "w8a8":
        q, scales = native.quantize_int8(w)
        return QuantLinear(jnp.asarray(q), jnp.asarray(scales), mode="w8a8")
    g = group_size if K % group_size == 0 else K
    packed, scales = native.quantize_pack_int4(w, group_size=g)
    return QuantLinear(
        jnp.asarray(packed), jnp.asarray(scales), mode=mode, group_size=g
    )


def load_llama(
    path: str,
    config: LlamaConfig,
    mode: str = "w4a8",
    group_size: int = 128,
    prefix: str = "model.",
) -> ServingParams:
    """Build frozen ServingParams from an HF-layout Llama checkpoint."""
    tensors = load_tensors(path)

    def t(name: str) -> np.ndarray:
        key = f"{prefix}{name}" if f"{prefix}{name}" in tensors else name
        return tensors[key]

    def linear(name: str) -> QuantLinear:
        # HF (out, in) → ours (in, out)
        return _quantize(np.asarray(t(name)).T, mode, group_size)

    layers = []
    for i in range(config.num_layers):
        p = f"layers.{i}."
        layers.append(
            ServingLayer(
                q_proj=linear(p + "self_attn.q_proj.weight"),
                k_proj=linear(p + "self_attn.k_proj.weight"),
                v_proj=linear(p + "self_attn.v_proj.weight"),
                o_proj=linear(p + "self_attn.o_proj.weight"),
                gate_proj=linear(p + "mlp.gate_proj.weight"),
                up_proj=linear(p + "mlp.up_proj.weight"),
                down_proj=linear(p + "mlp.down_proj.weight"),
                input_norm=jnp.asarray(t(p + "input_layernorm.weight"), jnp.bfloat16),
                post_norm=jnp.asarray(
                    t(p + "post_attention_layernorm.weight"), jnp.bfloat16
                ),
            )
        )

    lm_head: Optional[QuantLinear] = None
    if not config.tie_embeddings:
        head = tensors.get("lm_head.weight")
        if head is not None:
            lm_head = _quantize(np.asarray(head).T, mode, group_size)

    return ServingParams(
        embedding=jnp.asarray(t("embed_tokens.weight"), jnp.bfloat16),
        layers=tuple(layers),
        final_norm=jnp.asarray(t("norm.weight"), jnp.bfloat16),
        lm_head=lm_head,
    )
