"""Asset cache directories.

Parity: reference `src/fastforward/cache.py:8` (`get_assets_path`).
"""

import os
from pathlib import Path
from typing import Optional


def get_assets_path(
    kind: str, tag: str, cache_dir: Optional[str] = None
) -> Path:
    """Return (and create) ``<cache>/fastforward_tpu/<kind>/<tag>``."""
    base = Path(
        cache_dir
        or os.environ.get("FASTFORWARD_TPU_CACHE")
        or Path.home() / ".cache" / "fastforward_tpu"
    )
    path = base / kind / tag
    path.mkdir(parents=True, exist_ok=True)
    return path
