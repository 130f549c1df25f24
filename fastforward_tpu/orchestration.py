"""Orchestration: model tracing and algorithm registry.

Parity: reference `src/fastforward/orchestration.py` + `_orchestration/`
(trace → GraphModule → InstructionScheduler → InstructionEngine, ~3.3k LoC).

The reference builds an eager-graph VM because torch has no program
representation to lean on. Under JAX the *jaxpr is the graph* and XLA is the
scheduler/executor, so this module keeps only the pieces that still carry
information:

  - `trace(model, *args)` — stage the model and return a `TracedGraph`:
    the closed jaxpr, per-primitive counts, and XLA's cost analysis
    (flops/bytes) — the structural+cost view the reference's GraphModule
    provides (`_orchestration/graph_module.py`).
  - `Algorithm` registry — named (algorithm, target-query) registrations
    resolved against a model (`_orchestration/registry.py:250-279`).
  - `layerwise_optimize` (in `algorithms.layerwise`) — the execution driver
    replacing the instruction VM (`orchestration.py:57-113`); host
    activation caching replaces `OffloadEverything`.
"""

import dataclasses
from typing import Any, Callable, Optional

import jax

from fastforward_tpu import flags, mpath


@dataclasses.dataclass
class TracedGraph:
    """Structural + cost view of a staged model forward."""

    jaxpr: Any
    primitive_counts: dict[str, int]
    cost: Optional[dict[str, float]]
    module_inventory: list[tuple[str, str]]  # (path, type name)

    @property
    def num_equations(self) -> int:
        return sum(self.primitive_counts.values())

    def summary(self) -> str:
        lines = [f"equations: {self.num_equations}"]
        for name, count in sorted(
            self.primitive_counts.items(), key=lambda kv: -kv[1]
        )[:20]:
            lines.append(f"  {name}: {count}")
        if self.cost:
            flops = self.cost.get("flops")
            if flops:
                lines.append(f"flops: {flops:.3e}")
        return "\n".join(lines)


def _count_primitives(jaxpr, counts: dict[str, int]) -> None:
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] = counts.get(eqn.primitive.name, 0) + 1
        for param in eqn.params.values():
            if hasattr(param, "jaxpr"):
                _count_primitives(param.jaxpr, counts)


def trace(model: Any, *args: Any, strict: bool = False, **kwargs: Any) -> TracedGraph:
    """Stage one forward of ``model`` and return its TracedGraph.

    Runs non-strict by default (parity: the reference traces with
    quantization disabled, `_orchestration/trace.py:473-544`).
    """
    def fn(*a, **k):
        with flags.strict_quantization(strict):
            return model(*a, **k)

    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    counts: dict[str, int] = {}
    _count_primitives(closed.jaxpr, counts)

    cost = None
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = dict(lowered.compile().cost_analysis() or {})
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    from flax import nnx

    inventory = [
        ("/".join(str(p) for p in path), type(m).__name__)
        for path, m in nnx.iter_modules(model)
        if path
    ]
    return TracedGraph(
        jaxpr=closed, primitive_counts=counts, cost=cost,
        module_inventory=inventory,
    )


# --- algorithm registry (reference `_orchestration/registry.py`) -------------


@dataclasses.dataclass
class AlgorithmSpec:
    name: str
    algorithm: Callable[..., None]
    targets: str
    kwargs: dict[str, Any]


_REGISTRY: dict[str, AlgorithmSpec] = {}


def register(
    name: str, algorithm: Callable[..., None], targets: str, **kwargs: Any
) -> AlgorithmSpec:
    """Register an algorithm against a target query."""
    spec = AlgorithmSpec(name, algorithm, targets, kwargs)
    _REGISTRY[name] = spec
    return spec


def resolve(model: Any, name: str, context: Optional[dict] = None):
    """Resolve a registered algorithm's targets against a model."""
    spec = _REGISTRY[name]
    return spec, mpath.search(spec.targets, model, context=context)


def registered_algorithms() -> dict[str, AlgorithmSpec]:
    return dict(_REGISTRY)


def layerwise_optimize(*args: Any, **kwargs: Any):
    """Re-export of the layer-wise driver (reference `orchestration.py:57`)."""
    from fastforward_tpu.algorithms.layerwise import layerwise_optimize as impl

    return impl(*args, **kwargs)


# Structural module graph (reference GraphModule / trace / scheduled
# execution) — see fastforward_tpu/graph.py for the design mapping.
from fastforward_tpu.graph import (  # noqa: E402  (re-export)
    GraphModule,
    SubgraphSpec,
    run_scheduled,
    trace_modules,
)

__all__ = [
    "AlgorithmSpec",
    "GraphModule",
    "SubgraphSpec",
    "TracedGraph",
    "layerwise_optimize",
    "register",
    "registered_algorithms",
    "resolve",
    "run_scheduled",
    "trace",
    "trace_modules",
]
