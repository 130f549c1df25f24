"""Token sampling for the decode loop.

Serving-side capability with no reference counterpart (the reference is a
quantization research library, SURVEY §2.9); API shape follows the common
serving convention (temperature / top-k / top-p, per-request seeds).

Everything is jit-traceable with static shapes: top-k masks the sorted tail,
top-p masks the sorted cumulative-probability tail; `temperature == 0`
selects greedy argmax via `lax.select` so one compiled program serves both
greedy and stochastic requests.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-batch sampling configuration (scalars broadcast over the batch).

    temperature: 0 → greedy argmax; otherwise logits are divided by it.
    top_k: keep only the k highest-probability tokens (0 disables).
    top_p: keep the smallest prefix of sorted tokens whose cumulative
        probability reaches p (1.0 disables).
    """

    temperature: float = dataclasses.field(
        metadata=dict(static=True), default=1.0
    )
    top_k: int = dataclasses.field(metadata=dict(static=True), default=0)
    top_p: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


def _apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Mask all but the k largest logits per row to -inf.

    ``k`` larger than the vocabulary degrades to a no-op (clamped) rather
    than tripping `lax.top_k`'s k <= dim requirement inside the jitted step.
    """
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering: keep the smallest sorted prefix with cum-prob >= p.

    The highest-probability token is always kept (the mask is shifted by one
    position so the token that crosses the threshold is still included).
    """
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep positions whose *preceding* cumulative mass is < p
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    # threshold logit: smallest kept logit per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample_logits(
    logits: jax.Array,
    params: SamplingParams,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample one token id per row of ``logits`` (..., vocab) → (...,) int32.

    Greedy when ``params.temperature == 0`` (key may be None); otherwise
    temperature-scaled categorical sampling after top-k / top-p filtering.
    """
    if params.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("stochastic sampling requires a PRNG key")
    scaled = logits.astype(jnp.float32) / params.temperature
    if params.top_k and params.top_k > 0:
        scaled = _apply_top_k(scaled, params.top_k)
    if params.top_p < 1.0:
        scaled = _apply_top_p(scaled, params.top_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def sample_logits_per_row(
    logits: jax.Array,        # (B, V)
    temperature: jax.Array,   # (B,) f32 — 0 → greedy for that row
    top_k: jax.Array,         # (B,) int32 — 0 disables
    top_p: jax.Array,         # (B,) f32 — 1.0 disables
    key: jax.Array,
) -> jax.Array:
    """Per-row (per-request) sampling in one fixed-shape jitted program.

    The continuous-batching engine multiplexes requests with heterogeneous
    sampling configs onto one decode step; here the config is *data*
    ((B,) arrays) rather than static fields, so one compiled program serves
    every mix. Matches `sample_logits` semantics row-wise: greedy argmax
    where temperature == 0, temperature → top-k → top-p → categorical
    elsewhere.
    """
    B, V = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _stochastic(_):
        safe_t = jnp.where(temperature > 0, temperature, 1.0)
        scaled = logits.astype(jnp.float32) / safe_t[:, None]

        # per-row top-k: kth-largest threshold via a descending sort
        sorted_l = jnp.sort(scaled, axis=-1)[..., ::-1]
        k_eff = jnp.where(top_k > 0, jnp.clip(top_k, 1, V), V)
        kth = jnp.take_along_axis(sorted_l, (k_eff - 1)[:, None], axis=-1)
        scaled2 = jnp.where(scaled < kth, NEG_INF, scaled)

        # per-row top-p on the (re-)sorted masked logits
        sorted2 = jnp.sort(scaled2, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted2, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = jnp.concatenate(
            [jnp.ones_like(cum[:, :1], bool), cum[:, :-1] < top_p[:, None]],
            axis=-1,
        )
        thresh = jnp.min(
            jnp.where(keep, sorted2, jnp.inf), axis=-1, keepdims=True
        )
        scaled3 = jnp.where(scaled2 < thresh, NEG_INF, scaled2)

        sampled = jax.random.categorical(key, scaled3, axis=-1).astype(jnp.int32)
        return jnp.where(temperature > 0, sampled, greedy_tok)

    # The stochastic path costs two full (B, V) sorts — ~70 ms/step at
    # batch 192 over a 128k vocab, 4.5x the whole decode step. An
    # all-greedy batch (the common greedy-serving case) skips it entirely;
    # the predicate is data, so one compiled program still serves any mix.
    return jax.lax.cond(
        jnp.any(temperature > 0), _stochastic, lambda _: greedy_tok, None
    )
