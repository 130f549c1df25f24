"""Dataclass helpers.

Parity: reference `src/fastforward/dataclasses.py:9` (`nocopy_asdict`).
"""

import dataclasses
from typing import Any


def nocopy_asdict(obj: Any) -> dict[str, Any]:
    """Like `dataclasses.asdict` but without deep-copying values.

    Required for dataclasses holding `jax.Array` fields: arrays must be
    passed by reference, never copied or recursed into.
    """
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}
