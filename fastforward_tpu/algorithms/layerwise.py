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

import contextlib
from typing import Any, Callable, Iterable, Optional, Sequence, Union

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


class _EarlyExit(Exception):
    """Raised by the stage-input catcher to abort the forward after the
    prelude (embedding etc.) has produced the first stage's input."""


@contextlib.contextmanager
def _catch_stage_inputs(module: Any, sink: list, abort: bool):
    """Temporarily intercept calls to ``module`` (one specific instance),
    appending host copies of (args, kwargs) to ``sink``.

    Interception patches ``type(module).__call__`` with an instance check —
    JAX/nnx modules dispatch ``stage(x)`` through the class, so instance
    attributes cannot intercept. With ``abort`` the real body never runs
    (AutoGPTQ-style catcher): capturing stage-0 inputs costs only the
    prelude compute, not a full forward.
    """
    cls = type(module)
    orig = cls.__call__

    def wrapper(self, *args, **kwargs):
        if self is module:
            sink.append((jax.device_get(args), jax.device_get(kwargs)))
            if abort:
                raise _EarlyExit
        return orig(self, *args, **kwargs)

    cls.__call__ = wrapper
    try:
        yield
    finally:
        cls.__call__ = orig


def layerwise_optimize_staged(
    model: Any,
    calibration_batches: Iterable[Any],
    algorithm: Callable[..., None],
    *,
    stages: Union[str, Sequence[Any]],
    targets: str = "**/[cls:QuantizedLinear]",
    context: Optional[dict] = None,
    forward: Optional[Callable[[Any, Any], Any]] = None,
    stage_output: Callable[[Any], Any] = lambda out: out[0] if isinstance(out, tuple) else out,
    **algorithm_kwargs: Any,
) -> list[str]:
    """Single-pass layer-sequential optimization with host activation caching.

    The capability of the reference's scheduled instruction engine
    (`_orchestration/instruction_engine.py:689-990`: one pass, each layer fed
    cached already-optimized upstream activations, lifetime-managed) without
    the VM — a cached stage walker:

      1. One *prelude-only* pass over the calibration batches captures stage
         0's inputs (a catcher aborts the forward at the stage boundary, so
         the embedding/prelude is the only compute).
      2. Per stage: run the stage once over the cached inputs with recorders
         on each target's ``input_quantizer`` (captures target inputs), run
         ``algorithm`` on every target, then re-run the stage with the now
         *optimized* weights to produce the next stage's cached inputs
         (faithful GPTQ error propagation).

    Total stage compute = 2 stage-forwards per stage per batch — a 16-layer
    model with 32 batches costs 2× one full forward of layer compute, vs the
    O(L) full forwards of ``layerwise_optimize(sequential=True)``.

    ``stages``: ordered stage modules, or an mpath query resolving to them —
    each stage must take the previous stage's (hidden-state) output as its
    first positional argument; remaining args/kwargs are captured per batch
    in the prelude pass and replayed. ``stage_output`` extracts the hidden
    state from a stage's return value (default: first element of a tuple).
    ``targets`` is searched *within* each stage.

    Activations live on host between stages (`jax.device_get`/`device_put`) —
    the analog of the reference's `OffloadEverything` ping-pong.

    Returns the optimized module paths ("<stage>/<target>").
    """
    from fastforward_tpu import flags

    batches = list(calibration_batches)
    run = forward or (lambda m, b: m(b))

    if isinstance(stages, str):
        stage_items = list(mpath.search(stages, model, context=context))
        stage_list = [(item.full_name, item.module) for item in stage_items]
    else:
        stage_list = [(f"stage{i}", m) for i, m in enumerate(stages)]
    if not stage_list:
        return []

    # 1. Prelude pass: catch stage-0 inputs, abort before the stage body.
    cached: list = []
    first_stage = stage_list[0][1]
    with _catch_stage_inputs(first_stage, cached, abort=True):
        with flags.strict_quantization(False):
            for batch in batches:
                try:
                    run(model, batch)
                except _EarlyExit:
                    pass
    if len(cached) != len(batches):
        raise RuntimeError(
            f"stage-input capture saw {len(cached)} calls for {len(batches)} "
            "batches — is the first stage called exactly once per forward?"
        )

    optimized: list[str] = []
    for stage_name, stage in stage_list:
        t_items = list(mpath.search(targets, stage, context=context))
        recorders, handles = [], []
        for item in t_items:
            r, h = _attach_recorder(item.module)
            recorders.append(r)
            handles.append(h)
        try:
            with flags.strict_quantization(False):
                for args, kwargs in cached:
                    args = jax.device_put(args)
                    stage(*args, **kwargs)
        finally:
            for h in handles:
                h.remove()
        for item, r in zip(t_items, recorders):
            algorithm(item.module, r.concat(), **algorithm_kwargs)
            optimized.append(f"{stage_name}/{item.full_name}")
        # 2. Recompute this stage's outputs with optimized weights → the
        #    next stage's cached inputs; the previous cache entry is dropped
        #    immediately (lifetime management).
        new_cached = []
        with flags.strict_quantization(False):
            for args, kwargs in cached:
                args = jax.device_put(args)
                out = stage_output(stage(*args, **kwargs))
                new_cached.append(
                    ((jax.device_get(out),) + args[1:], kwargs)
                )
        cached = new_cached
    return optimized
