"""Profiling and tracing helpers.

Aux-subsystem parity (SURVEY §5 "Tracing/profiling"): the reference has only
structural tracing; on TPU, time-based profiling comes nearly free via
`jax.profiler`. These wrappers standardize the two entry points the rest of
the framework (and `bench.py`) use.
"""

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profile into ``log_dir`` (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up in profiles (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def benchmark(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 10,
    warmup: int = 1,
    **kwargs: Any,
) -> dict[str, float]:
    """Wall-clock a jitted callable: returns {mean_s, best_s, iters}.

    Blocks on the result each iteration; the first `warmup` calls are
    excluded (compilation).
    """
    def _block(result: Any) -> None:
        for leaf in jax.tree_util.tree_leaves(result):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()

    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(times) / len(times),
        "best_s": min(times),
        "iters": float(iters),
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> dict[str, int]:
    """Live/peak HBM usage for a device (empty dict if unsupported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
