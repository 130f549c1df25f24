"""Device mesh construction.

New TPU capability (SURVEY §2.9 — the reference has no distributed layer).
Scaling is mesh-first: pick axes (data, model), annotate shardings, and let
XLA/GSPMD insert the ICI collectives.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a Mesh from {axis_name: size}.

    Defaults to a pure model-parallel mesh over all local devices:
    ``make_mesh({"data": 1, "model": N})``. Axis sizes must multiply to the
    device count; a single ``-1`` axis is inferred.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": 1, "model": n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if sizes.count(-1) == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {dict(zip(names, sizes))} do not cover {n} devices")
    return Mesh(np.asarray(devices).reshape(sizes), tuple(names))
