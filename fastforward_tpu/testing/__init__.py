"""Testing utilities.

Parity: reference `src/fastforward/testing/` — `sqnr` metric, quantizer
initialization helpers, PRNG seeding, rounding-boundary checks.
"""

from fastforward_tpu.testing.initialization import initialize_quantizers_to_linear_quantizer
from fastforward_tpu.testing.package_mock import PackageMock
from fastforward_tpu.utils.metrics import sqnr

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sqnr",
    "initialize_quantizers_to_linear_quantizer",
    "seed_prngs",
    "is_close_to_rounding",
    "dedent_strip",
    "assert_strings_match_verbose",
    "PackageMock",
]


def dedent_strip(s: str) -> str:
    """Dedent + strip a triple-quoted block (reference `testing/string.py:8`)."""
    import textwrap

    return textwrap.dedent(s).strip()


def assert_strings_match_verbose(actual: str, expected: str) -> None:
    """Assert string equality with a line-level diff on mismatch
    (reference `testing/string.py:13`)."""
    if actual == expected:
        return
    import difflib

    diff = "\n".join(
        difflib.unified_diff(
            expected.splitlines(), actual.splitlines(),
            fromfile="expected", tofile="actual", lineterm="",
        )
    )
    raise AssertionError(f"strings do not match:\n{diff}")


def seed_prngs(seed: int = 0xF0F0) -> jax.Array:
    """Seed numpy and return a jax PRNG key (reference `testing/__init__.py:22`)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def is_close_to_rounding(data, scale=1.0, eps: float = 1e-4) -> jax.Array:
    """True where data/scale sits within eps of a rounding boundary
    (half-integers) — used to exclude unstable comparisons in tests
    (reference `testing/__init__.py:13`)."""
    x = jnp.asarray(data) / scale
    frac = jnp.abs(x - jnp.floor(x) - 0.5)
    return frac < eps
