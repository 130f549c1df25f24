"""Layer-wise optimization driver.

Parity: reference `orchestration.py:57-113` + `_orchestration/` (trace →
instruction scheduling → offloaded execution). The reference builds a
multi-resolution graph and an instruction VM because eager torch has no other
way to run layers out of order with activation caching; under JAX the same
capability is a *capture-then-optimize* loop over jitted forwards:

  1. find target modules (mpath query),
  2. capture each target's calibration inputs with an override hook,
  3. optimize targets in model order; in sequential mode the inputs for
     layer i+1 are re-captured after layer i was optimized (faithful GPTQ
     error propagation, like the reference's graph executor feeding each
     layer the *optimized* upstream activations).

Activations are cached on host (`jax.device_get`) — the analog of the
reference's `OffloadEverything` CPU↔GPU ping-pong
(`instruction_engine.py:1148-1188`); device_put back per-layer.
"""

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu import mpath
from fastforward_tpu.forward_override import OverrideHandle


class _InputRecorder:
    """Override on a module's input quantizer (or a wrapper hook) that
    captures the module input batches to host memory."""

    def __init__(self):
        self.batches: list[np.ndarray] = []
        self.enabled = True

    def __call__(self, context, overridden_fn, args, kwargs):
        if self.enabled:
            self.batches.append(jax.device_get(args[0]))
        return overridden_fn(*args, **kwargs)

    def concat(self) -> jax.Array:
        data = np.concatenate([b.reshape(-1, b.shape[-1]) for b in self.batches], axis=0)
        return jnp.asarray(data)


def _attach_recorder(module) -> tuple[_InputRecorder, OverrideHandle]:
    """Record the module's input via its input_quantizer override slot."""
    recorder = _InputRecorder()
    quantizer = getattr(module, "input_quantizer", None)
    if quantizer is None:
        raise ValueError(
            f"Module {type(module).__name__} has no input_quantizer slot to "
            "hook; convert the model with quantize_model first."
        )
    handle = quantizer.register_override(recorder)
    return recorder, handle


def layerwise_optimize(
    model: Any,
    calibration_batches: Iterable[Any],
    algorithm: Callable[..., None],
    *,
    targets: str = "**/[cls:QuantizedLinear]",
    context: Optional[dict] = None,
    sequential: bool = True,
    forward: Optional[Callable[[Any, Any], Any]] = None,
    **algorithm_kwargs: Any,
) -> list[str]:
    """Run ``algorithm(module, inputs, **kwargs)`` on every target module.

    - ``calibration_batches``: iterable of model inputs (re-iterated per
      capture pass — pass a list).
    - ``sequential=True``: re-capture activations after each layer is
      optimized (error propagation); ``False``: one capture pass for all.
    - ``forward``: optional ``(model, batch) -> out`` override.

    Returns the list of optimized module paths.
    """
    from fastforward_tpu import flags

    batches = list(calibration_batches)
    run = forward or (lambda m, b: m(b))

    items = list(mpath.search(targets, model, context=context))
    if not items:
        return []

    def capture(modules) -> dict[int, jax.Array]:
        recorders = []
        handles = []
        for m in modules:
            r, h = _attach_recorder(m)
            recorders.append(r)
            handles.append(h)
        try:
            with flags.strict_quantization(False):
                for batch in batches:
                    run(model, batch)
        finally:
            for h in handles:
                h.remove()
        return [r.concat() for r in recorders]

    optimized = []
    if not sequential:
        inputs = capture([item.module for item in items])
        for item, x in zip(items, inputs):
            algorithm(item.module, x, **algorithm_kwargs)
            optimized.append(item.full_name)
    else:
        for item in items:
            (x,) = capture([item.module])
            algorithm(item.module, x, **algorithm_kwargs)
            optimized.append(item.full_name)
    return optimized
