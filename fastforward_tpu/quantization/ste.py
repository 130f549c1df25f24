"""Straight-through estimators.

Parity: reference `src/fastforward/quantization/ste.py:13-97`. Instead of an
autograd.Function factory, STE on JAX is the classic stop-gradient identity
trick — ``x + stop_gradient(f(x) - x)`` — which XLA fuses into the surrounding
elementwise computation with zero overhead.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def ste(func: Callable[..., jax.Array]) -> Callable[..., jax.Array]:
    """Wrap ``func`` so its forward value is used but gradients flow straight
    through to the first argument (identity backward).
    """

    def wrapper(data: jax.Array, *args, **kwargs) -> jax.Array:
        return data + jax.lax.stop_gradient(func(data, *args, **kwargs) - data)

    wrapper.__name__ = f"{getattr(func, '__name__', 'fn')}_ste"
    return wrapper


def round_ste(data: jax.Array) -> jax.Array:
    """Round with a straight-through (identity) gradient.

    Uses round-half-to-even, matching `torch.round` in the reference
    (`ste.py:96`).
    """
    return data + jax.lax.stop_gradient(jnp.round(data) - data)
