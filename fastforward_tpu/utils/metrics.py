"""Quantization quality metrics.

Parity: reference `src/fastforward/testing/metrics.py:9` (`sqnr`).
"""

import jax
import jax.numpy as jnp


def sqnr(original: jax.Array, quantized: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Signal-to-quantization-noise ratio in dB."""
    from fastforward_tpu.quantization.quantized_array import QuantizedArray

    if isinstance(quantized, QuantizedArray):
        quantized = quantized.dequantize()
    if isinstance(original, QuantizedArray):
        original = original.dequantize()
    signal = jnp.mean(jnp.asarray(original, jnp.float32) ** 2)
    noise = jnp.mean((jnp.asarray(original, jnp.float32) - jnp.asarray(quantized, jnp.float32)) ** 2)
    return 10.0 * jnp.log10(signal / (noise + eps))
