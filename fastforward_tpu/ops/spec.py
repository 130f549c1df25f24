"""Operator spec serialization.

Parity: reference `_quantops/quantized_operators.yaml` is the reference's
single source of truth for quantizable operators; here the decorated
functions are the source of truth and the YAML view is *generated* from the
table (the inverse of the reference's codegen direction — there YAML
generates code, here code generates YAML).
"""

import inspect
from typing import Any

import yaml

from fastforward_tpu.ops.optable import OPERATOR_TABLE, OperatorSpec


def _signature_string(spec: OperatorSpec) -> str:
    sig = inspect.signature(spec.dense_fn)
    parts = []
    for name, param in sig.parameters.items():
        if name in spec.quantized:
            kind = "Quantized"
        elif name in spec.maybe_quantized:
            kind = "MaybeQuantized"
        else:
            kind = "Any"
        if param.default is inspect.Parameter.empty:
            parts.append(f"{name}: {kind}")
        else:
            parts.append(f"{name}: {kind} = {param.default!r}")
    return f"{spec.name}({', '.join(parts)}) -> Quantized"


def operator_table_to_yaml() -> str:
    """Render the live operator table in the reference's YAML shape."""
    entries: list[dict[str, Any]] = []
    for spec in OPERATOR_TABLE.values():
        entry: dict[str, Any] = {
            "op": _signature_string(spec),
            "fallback": f"fastforward_tpu.ops.operators.{spec.dense_fn.__name__}",
        }
        if spec.aliases:
            entry["aliases"] = list(spec.aliases)
        entries.append(entry)
    return yaml.safe_dump(entries, sort_keys=False)


def write_operator_yaml(path: str) -> None:
    import fastforward_tpu.ops  # noqa: F401  — populate the table

    with open(path, "w") as f:
        f.write(operator_table_to_yaml())
