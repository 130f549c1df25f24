"""Model export: StableHLO program + quantization-spec manifest.

Parity: reference `src/fastforward/export/` (ONNX/QNN pipelines). The
TPU-native deliverable (SURVEY §7) is a serialized StableHLO program — the
portable exchange format of the XLA ecosystem — plus the same side-channel
encodings file the reference emits (`export/export.py:37-120` runs under
export_mode; we do the same so every quantizer stages out as QDQ ops in a
plain dense-dtype graph).
"""

import json
import os
from typing import Any, Optional

import jax
import numpy as np

from fastforward_tpu import flags
from fastforward_tpu.export.encodings import (
    SCHEMA_HANDLERS,
    LPBQProcessor,
    QuantizerEncoding,
    V2SchemaHandler,
)
from fastforward_tpu.nn.quantized_module import named_quantizers
from fastforward_tpu.nn.quantizer import QuantizerStub


def collect_encodings(model: Any) -> list[QuantizerEncoding]:
    """Collect quantizer state from a model into schema-ready entries."""
    from fastforward_tpu.nn.linear_quantizer import LinearQuantizer

    out = []
    seen: set[int] = set()
    for name, q in named_quantizers(model):
        if isinstance(q, QuantizerStub) or id(q) in seen:
            continue
        seen.add(id(q))
        if not isinstance(q, LinearQuantizer) or q.scale is None:
            continue
        meta = getattr(q, "quant_metadata", None)
        out.append(
            QuantizerEncoding(
                name=name,
                num_bits=q.num_bits,
                scale=np.asarray(jax.device_get(q.scale.value)),
                offset=None if q.offset is None else np.asarray(jax.device_get(q.offset.value)),
                granularity=q.granularity,
                symmetric=q.symmetric,
                data_shape=getattr(meta, "input_shape", None) if meta else None,
                producing_operator=(
                    getattr(meta, "producing_operator", None) if meta else None
                ),
            )
        )
    return out


def export(
    model: Any,
    sample_args: tuple,
    output_dir: str,
    name: str = "model",
    schema: str = "v1",
    lpbq: Optional[LPBQProcessor] = None,
    sample_kwargs: Optional[dict] = None,
    annotate: bool = True,
) -> dict[str, str]:
    """Export ``model`` to ``<output_dir>/<name>.stablehlo.mlir`` +
    ``<name>.encodings.json``.

    The forward is staged under export mode (every quantizer emits QDQ'd
    plain arrays — reference `export/export.py:37` semantics) and serialized
    via `jax.export`. Returns the written paths.
    """
    os.makedirs(output_dir, exist_ok=True)
    sample_kwargs = sample_kwargs or {}

    if annotate:
        # Tag every quantizer with the operator that fed it so the
        # encodings carry per-op metadata (reference
        # `quantizer_annotations.py:63-99` -> `onnx_export_stages.py:532`).
        from fastforward_tpu.quantization.quantizer_annotations import (
            annotate_operator_metadata,
        )

        annotate_operator_metadata(model, *sample_args, **sample_kwargs)

    def fn(*args, **kwargs):
        with flags.export_mode(True), flags.strict_quantization(False):
            return model(*args, **kwargs)

    exported = jax.export.export(jax.jit(fn))(*sample_args, **sample_kwargs)
    mlir_text = exported.mlir_module()

    mlir_path = os.path.join(output_dir, f"{name}.stablehlo.mlir")
    with open(mlir_path, "w") as f:
        f.write(mlir_text)

    # Serialized portable artifact as well (versioned bytes).
    bytes_path = os.path.join(output_dir, f"{name}.stablehlo.bin")
    with open(bytes_path, "wb") as f:
        f.write(exported.serialize())

    handler_cls = SCHEMA_HANDLERS[schema]
    handler = handler_cls(lpbq) if handler_cls is V2SchemaHandler else handler_cls()
    encodings = handler.encode(collect_encodings(model))
    enc_path = os.path.join(output_dir, f"{name}.encodings.json")
    with open(enc_path, "w") as f:
        json.dump(encodings, f, indent=2)

    return {"mlir": mlir_path, "serialized": bytes_path, "encodings": enc_path}


def export_modules(
    model: Any,
    sample_args: tuple,
    query: str,
    output_dir: str,
    schema: str = "v1",
    context: Optional[dict] = None,
) -> dict[str, dict[str, str]]:
    """Export each module matching ``query`` separately, capturing its real
    input from a sample forward (reference `export/module_export.py:44-204`).
    """
    from fastforward_tpu import mpath

    items = list(mpath.search(query, model, context=context))
    captured: dict[str, Any] = {}

    handles = []
    for item in items:
        quantizer = getattr(item.module, "input_quantizer", None)
        if quantizer is None:
            continue

        def recorder(ctx, inner, args, kwargs, _name=item.full_name):
            captured.setdefault(_name, args[0])
            return inner(*args, **kwargs)

        handles.append(quantizer.register_override(recorder))
    try:
        with flags.strict_quantization(False):
            model(*sample_args)
    finally:
        for h in handles:
            h.remove()

    results = {}
    for item in items:
        if item.full_name not in captured:
            continue
        sub_dir = os.path.join(output_dir, item.full_name.replace("/", "_"))
        results[item.full_name] = export(
            item.module, (captured[item.full_name],), sub_dir,
            name=item.full_name.replace("/", "_"), schema=schema,
        )
    return results
