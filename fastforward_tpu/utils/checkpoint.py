"""Quantization-state checkpointing.

Parity: reference `QuantizedModule.save_quantization_state` /
`load_quantization_state` (`nn/quantized_module.py:363-652`): a safetensors
file with quantizer parameters plus a ``config.yaml`` reconstructing each
quantizer (type + ctor args), shared-quantizer dedup by lexicographically
first path, ``::lazy`` markers for uninitialized parameters, versioned.

Model weights themselves go through normal orbax/flax checkpointing — this
covers only the quantization state, so a calibrated/GPTQ'd model can be
re-created on top of freshly loaded base weights.
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import yaml

from fastforward_tpu.exceptions import QuantizationError
from fastforward_tpu.nn.quantized_module import named_quantizers
from fastforward_tpu.nn.quantizer import Quantizer, QuantizerStub
from fastforward_tpu.utils import serialization

FORMAT_VERSION = "1.0"
LAZY_MARKER = "::lazy"


def _quantizer_config(quantizer: Quantizer) -> dict[str, Any]:
    from fastforward_tpu.nn.linear_quantizer import (
        DynamicLinearQuantizer,
        LinearQuantizer,
    )

    t = type(quantizer)
    config: dict[str, Any] = {
        "type": f"{t.__module__}.{t.__qualname__}",
        "args": {},
        "params": {},
    }
    if isinstance(quantizer, (LinearQuantizer, DynamicLinearQuantizer)):
        config["args"] = {
            "num_bits": quantizer.num_bits,
            "granularity": serialization.to_yamlable_dict(quantizer.granularity),
            "symmetric": quantizer.symmetric,
            "allow_one_sided": quantizer.allow_one_sided,
        }
    if isinstance(quantizer, LinearQuantizer):
        if quantizer.scale is None:
            config["params"]["scale"] = LAZY_MARKER
            config["params"]["offset"] = LAZY_MARKER
        else:
            config["params"]["scale"] = "scale"
            config["params"]["offset"] = None if quantizer.offset is None else "offset"
    return config


def save_quantization_state(
    model: Any,
    path: str,
    *,
    name_or_path: Optional[str] = None,
    allow_lazy_params: bool = False,
) -> None:
    """Write ``<path>/config.yaml`` + ``<path>/quantizers.safetensors``.

    ``name_or_path``: optional model identity recorded in the state file —
    loading against a different identity warns (reference
    `quantized_module.py:369-444` same-named argument).
    ``allow_lazy_params``: quantizers with uninitialized (lazy) parameters
    raise unless set — the silent ``::lazy`` markers are opt-in, matching
    the reference's `allow_lazy_params=False` default (`:446-470`).
    """
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}
    configs: dict[str, Any] = {}
    seen: dict[int, str] = {}  # id(quantizer) -> first path (dedup)

    for name, quantizer in named_quantizers(model):
        if isinstance(quantizer, QuantizerStub):
            continue
        if id(quantizer) in seen:
            configs[name] = {"shared_with": seen[id(quantizer)]}
            continue
        seen[id(quantizer)] = name
        config = _quantizer_config(quantizer)
        lazy = [
            p for p, key in config["params"].items() if key == LAZY_MARKER
        ]
        if lazy and not allow_lazy_params:
            raise QuantizationError(
                f"Quantizer at {name!r} has uninitialized (lazy) parameters "
                f"{lazy}; calibrate first or pass allow_lazy_params=True to "
                f"record them as lazy markers."
            )
        for param_name, key in list(config["params"].items()):
            if key in (None, LAZY_MARKER):
                continue
            value = getattr(quantizer, param_name)
            tensor_key = f"{name}.{param_name}"
            tensors[tensor_key] = np.asarray(jax.device_get(value.value))
            config["params"][param_name] = tensor_key
        configs[name] = config

    meta: dict[str, Any] = {"version": FORMAT_VERSION, "quantizers": configs}
    if name_or_path is not None:
        meta["name_or_path"] = name_or_path
    with open(os.path.join(path, "config.yaml"), "w") as f:
        yaml.safe_dump(meta, f)
    save_file(tensors, os.path.join(path, "quantizers.safetensors"))


def load_quantization_state(
    model: Any,
    path: str,
    overwrite_policy: str = "overwrite",
    *,
    name_or_path: Optional[str] = None,
    allow_lazy_params: bool = False,
) -> None:
    """Reconstruct quantizers from a saved state onto ``model`` (in place).

    ``overwrite_policy``: "error" | "skip" | "overwrite" for slots already
    holding non-stub quantizers (reference `quantized_module.py:630-652`).
    ``name_or_path``: when given and the state recorded a different
    identity, a warning is emitted (reference `:259-290` protocol).
    ``allow_lazy_params``: states containing ``::lazy`` markers raise
    unless set (the loaded quantizer would be silently uncalibrated).
    """
    import warnings

    from flax import nnx

    from fastforward_tpu import mpath
    from safetensors.numpy import load_file

    config_file = os.path.join(path, "config.yaml")
    model_file = os.path.join(path, "quantizers.safetensors")
    if not os.path.exists(config_file):
        raise QuantizationError(
            f"Quantization state config not found: {config_file}"
        )
    if not os.path.exists(model_file):
        raise QuantizationError(
            f"Quantization state tensors not found: {model_file}"
        )
    with open(config_file) as f:
        saved = yaml.safe_load(f)
    if saved.get("version") != FORMAT_VERSION:
        raise QuantizationError(
            f"Unsupported quantization state version {saved.get('version')}"
        )
    stored_name = saved.get("name_or_path")
    if (
        name_or_path is not None
        and stored_name is not None
        and stored_name != name_or_path
    ):
        warnings.warn(
            f"Quantization state was saved for {stored_name!r} but is being "
            f"loaded for {name_or_path!r}",
            stacklevel=2,
        )
    if not allow_lazy_params:
        lazy_names = [
            n for n, c in saved["quantizers"].items()
            if any(v == LAZY_MARKER for v in c.get("params", {}).values())
        ]
        if lazy_names:
            raise QuantizationError(
                f"Quantization state contains lazy (uncalibrated) quantizers "
                f"{lazy_names}; pass allow_lazy_params=True to load them "
                f"uninitialized."
            )
    tensors = load_file(model_file)

    built: dict[str, Quantizer] = {}

    def build(name: str, config: dict[str, Any]) -> Quantizer:
        if "shared_with" in config:
            return built[config["shared_with"]]
        import importlib

        mod_name, _, cls_name = config["type"].rpartition(".")
        cls = getattr(importlib.import_module(mod_name), cls_name)
        args = {
            k: serialization._decode(v) if isinstance(v, (dict, list)) else v
            for k, v in config.get("args", {}).items()
        }
        quantizer = cls(**args)
        params = config.get("params", {})
        scale_key = params.get("scale")
        if scale_key and scale_key != LAZY_MARKER:
            quantizer.scale = nnx.Param(jax.numpy.asarray(tensors[scale_key]))
            offset_key = params.get("offset")
            if offset_key:
                quantizer.offset = nnx.Param(jax.numpy.asarray(tensors[offset_key]))
            else:
                quantizer.offset = None
        return quantizer

    # Build in order so shared_with targets exist first.
    configs = saved["quantizers"]
    for name in sorted(configs, key=lambda n: ("shared_with" in configs[n], n)):
        built[name] = build(name, configs[name])

    for name, quantizer in built.items():
        items = mpath.search(name, model)
        if len(items) != 1:
            raise QuantizationError(f"Quantizer path {name!r} not found in model")
        current = items[0].module
        if not isinstance(current, QuantizerStub) and isinstance(current, Quantizer):
            if overwrite_policy == "error":
                raise QuantizationError(
                    f"Quantizer at {name!r} already initialized (policy=error)"
                )
            if overwrite_policy == "skip":
                continue
        items[0].update_module(quantizer)


# --- whole-pytree checkpoints (orbax) ----------------------------------------
# The reference delegates model weights to torch/HF checkpointing; the TPU
# analog (SURVEY §5 checkpoint/resume) is orbax over the params pytree —
# QuantizedArray / QuantLinear dataclass pytrees round-trip as-is, so frozen
# low-bit serving weights checkpoint without dequantizing.


def save_params(params: Any, path: str) -> None:
    """Save an arbitrary params pytree (quantized leaves included) via orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_params(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_params`.

    ``template``: a pytree of like-structured arrays (or ShapeDtypeStructs)
    restoring dtypes/structure exactly — required to get custom pytree
    dataclasses (QuantizedArray, QuantLinear) back instead of plain dicts.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            template,
        )
        return ckptr.restore(path, template)
