"""Quantized scaled-dot-product attention.

Parity: reference `src/fastforward/nn/functional/custom/sdpa.py:18-378` — a
fully quantizer-parameterized SDPA where every intermediate (scaled query/key,
attention scores, masked scores, attention weights, output) has its own
quantizer slot, plus an fp32-upcast context for the softmax.

TPU-native: the dense math is jnp (XLA fuses it into a flash-like schedule on
TPU); the execution tier overrides the whole op with a Pallas INT8-KV flash
kernel via the dispatcher (op name "scaled_dot_product_attention").
"""

import math
from contextvars import ContextVar
from typing import Any, Optional

import contextlib
import jax
import jax.numpy as jnp

from fastforward_tpu.ops.optable import quantized_op

_UPCAST = ContextVar("sdpa_upcast", default=True)


@contextlib.contextmanager
def sdpa_upcast(enabled: bool = True):
    """Context controlling fp32 upcast of the softmax (reference
    `sdpa.py:329-378`)."""
    token = _UPCAST.set(enabled)
    try:
        yield
    finally:
        _UPCAST.reset(token)


def _maybe(quantizer: Optional[Any], value: jax.Array) -> jax.Array:
    from fastforward_tpu.ops.optable import _is_stub
    from fastforward_tpu.quantization.quantized_array import QuantizedArray

    if _is_stub(quantizer):
        return value
    out = quantizer(value)
    if isinstance(out, QuantizedArray):
        return out.dequantize()
    return out


@quantized_op(
    name="scaled_dot_product_attention",
    quantized=("query", "key", "value"),
    maybe_quantized=("attn_mask",),
)
def scaled_dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    is_causal: bool = False,
    scale: Optional[float] = None,
    *,
    enable_gqa: bool = False,
    neg_inf: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    scaled_query_quantizer: Any = None,
    scaled_key_quantizer: Any = None,
    attn_scores_quantizer: Any = None,
    attn_mask_quantizer: Any = None,
    masked_scores_quantizer: Any = None,
    attn_weights_quantizer: Any = None,
    dropout_quantizer: Any = None,
) -> jax.Array:
    """Reference math implementation (`sdpa.py:93-265`) with per-intermediate
    quantizer hooks. Shapes: (..., seq, head_dim) with seq axis -2.

    ``enable_gqa``: grouped-query attention — key/value heads (axis -3) are
    repeat-interleaved up to the query head count (reference
    `sdpa.py:195-202`; like the reference, incompatible with strict
    quantization because the repeated tensors are plain arrays).

    ``neg_inf``: finite stand-in for the -inf mask fill (reference
    `sdpa.py:129-143` same-named argument) — required when a
    masked-scores quantizer is present, whose range estimator cannot
    observe -inf.
    """
    if enable_gqa:
        from fastforward_tpu.exceptions import QuantizationError
        from fastforward_tpu.flags import get_strict_quantization

        if get_strict_quantization():
            raise QuantizationError(
                "Strict quantization currently not supported when "
                "enable_gqa=True"
            )
        groups = query.shape[-3] // key.shape[-3]
        key = jnp.repeat(key, groups, axis=-3)
        value = jnp.repeat(value, groups, axis=-3)
    _fill = -jnp.inf if neg_inf is None else neg_inf
    head_dim = query.shape[-1]
    scale_factor = scale if scale is not None else 1.0 / math.sqrt(head_dim)
    # Split the scaling between q and k (reference applies sqrt to each) so
    # the intermediate quantizers see the values that actually hit the matmul.
    sqrt_scale = math.sqrt(scale_factor)

    q = _maybe(scaled_query_quantizer, query * sqrt_scale)
    k = _maybe(scaled_key_quantizer, key * sqrt_scale)

    scores = jnp.matmul(q, jnp.swapaxes(k, -1, -2))
    scores = _maybe(attn_scores_quantizer, scores)

    if is_causal:
        q_len, k_len = scores.shape[-2], scores.shape[-1]
        causal = jnp.tril(jnp.ones((q_len, k_len), dtype=bool), k_len - q_len)
        scores = jnp.where(causal, scores, _fill)

    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            scores = jnp.where(attn_mask, scores, _fill)
        else:
            scores = scores + _maybe(attn_mask_quantizer, attn_mask)
        scores = _maybe(masked_scores_quantizer, scores)

    if _UPCAST.get():
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(query.dtype)
    else:
        weights = jax.nn.softmax(scores, axis=-1)
    weights = _maybe(attn_weights_quantizer, weights)

    if dropout_p > 0.0:
        if rng is None:
            raise ValueError("dropout_p > 0 requires an explicit PRNG key via rng=")
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_p), 0.0)
        weights = _maybe(dropout_quantizer, weights)

    return jnp.matmul(weights, value)
