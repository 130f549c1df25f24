"""Evaluation harness: perplexity over token streams.

The BASELINE acceptance criterion is "≤ 0.1 perplexity delta vs the
simulated-quant reference at the same bit-width"; this harness computes the
perplexity of any causal-LM forward over token batches, so sim-tier vs
exec-tier deltas are measurable without external datasets (and with real
datasets when available — the protocol matches the reference's GPTQ e2e:
fixed-length windows, mean NLL over all positions,
`tests/_orchestration/test_gptq_end2end.py:59-74`).
"""

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def sequence_nll(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean negative log-likelihood of next-token prediction.

    logits: (B, T, V); targets: (B, T) — positions t predict targets[t+1].
    """
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = targets[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def evaluate_perplexity(
    forward: Callable[[jax.Array], jax.Array],
    token_batches: Iterable[jax.Array],
) -> float:
    """Perplexity of ``forward`` (ids → logits) over the batches."""
    total_nll, total_tokens = 0.0, 0
    nll_fn = jax.jit(lambda logits, ids: sequence_nll(logits, ids))
    for ids in token_batches:
        logits = forward(ids)
        n = ids.shape[0] * (ids.shape[1] - 1)
        total_nll += float(nll_fn(logits, ids)) * n
        total_tokens += n
    return float(np.exp(total_nll / total_tokens))


def perplexity_delta(
    forward_a: Callable[[jax.Array], jax.Array],
    forward_b: Callable[[jax.Array], jax.Array],
    token_batches: list,
) -> tuple[float, float, float]:
    """(ppl_a, ppl_b, |delta|) over the same batches."""
    ppl_a = evaluate_perplexity(forward_a, token_batches)
    ppl_b = evaluate_perplexity(forward_b, token_batches)
    return ppl_a, ppl_b, abs(ppl_a - ppl_b)
