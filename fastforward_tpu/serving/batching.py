"""Continuous batching engine.

New TPU capability (BASELINE config 4; absent in the reference). A host-side
scheduler multiplexes many generation requests onto one fixed-shape jitted
decode step:

  - the decode step always runs the full (max_batch) slot array with
    *per-slot positions* — finished/empty slots decode garbage that the host
    ignores (static shapes keep one compiled program for the whole server
    lifetime);
  - new requests prefill into a free slot via a batch-1 prefill whose KV rows
    are scattered into the shared cache at the slot index;
  - per-slot state (position, remaining budget, generated tokens) lives on
    host; device state is just the stacked INT8 KV cache.
"""

import dataclasses
import itertools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.models.llama import LlamaConfig
from fastforward_tpu.serving.stacked import (
    StackedKVCache,
    serving_forward_stacked,
)


@dataclasses.dataclass
class Request:
    request_id: int
    prompt: list[int]
    max_new_tokens: int
    eos_token: Optional[int] = None
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatchingEngine:
    def __init__(
        self,
        config: LlamaConfig,
        params: Any,
        stacked_layers: Any,
        *,
        max_batch: int = 8,
        max_len: int = 1024,
        quantized_cache: bool = True,
        sampling=None,
        seed: int = 0,
    ):
        from fastforward_tpu.serving.sampling import SamplingParams

        self.config = config
        self.params = params
        self.stacked = stacked_layers
        self.max_batch = max_batch
        self.max_len = max_len
        self.sampling = sampling or SamplingParams(temperature=0.0)
        self._key = jax.random.PRNGKey(seed)

        self.cache = StackedKVCache.create(
            num_layers=config.num_layers, batch_size=max_batch, max_len=max_len,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=quantized_cache,
        )
        self._small_cache_template = dict(
            num_layers=config.num_layers, batch_size=1, max_len=max_len,
            num_kv_heads=config.num_kv_heads, head_dim=config.head_dim,
            quantized=quantized_cache,
        )

        # Host-side slot state.
        self.slot_request: list[Optional[Request]] = [None] * max_batch
        self.slot_pos = np.zeros((max_batch,), np.int32)
        self.slot_token = np.zeros((max_batch,), np.int32)
        self._ids = itertools.count()
        self._pending: list[Request] = []
        self._done: dict[int, Request] = {}

        cfg = config
        sampling_params = self.sampling

        @jax.jit
        def _decode_step(params, stacked, cache, tokens, positions, key):
            from fastforward_tpu.serving.sampling import sample_logits

            logits, cache = serving_forward_stacked(
                params, stacked, cfg, tokens, cache=cache, positions=positions
            )
            nxt = sample_logits(logits[:, -1], sampling_params, key)
            return nxt.astype(jnp.int32), cache

        @jax.jit
        def _prefill(params, stacked, small_cache, ids, key):
            from fastforward_tpu.serving.sampling import sample_logits

            logits, small_cache = serving_forward_stacked(
                params, stacked, cfg, ids, cache=small_cache
            )
            nxt = sample_logits(logits[:, -1], sampling_params, key)
            return nxt.astype(jnp.int32), small_cache

        @jax.jit
        def _scatter_slot(cache: StackedKVCache, small: StackedKVCache, slot):
            def put(big, small_arr):
                # big: (L, B, H, S, D) or (L, B, H, S); small batch dim is 1.
                return jax.lax.dynamic_update_slice_in_dim(
                    big, small_arr.astype(big.dtype), slot, axis=1
                )

            return StackedKVCache(
                k=put(cache.k, small.k),
                v=put(cache.v, small.v),
                k_scale=None if cache.k_scale is None else put(cache.k_scale, small.k_scale),
                v_scale=None if cache.v_scale is None else put(cache.v_scale, small.v_scale),
                length=cache.length,
            )

        self._decode_step = _decode_step
        self._prefill = _prefill
        self._scatter_slot = _scatter_slot

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: list[int], max_new_tokens: int = 32,
               eos_token: Optional[int] = None) -> int:
        request = Request(next(self._ids), list(prompt), max_new_tokens, eos_token)
        self._pending.append(request)
        return request.request_id

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_request)

    def step(self) -> None:
        """Admit pending requests into free slots, then one decode step."""
        self._admit()
        if self.num_active == 0:
            return

        tokens = jnp.asarray(self.slot_token[:, None])
        positions = jnp.asarray(self.slot_pos[:, None])
        self._key, sub = jax.random.split(self._key)
        next_tokens, self.cache = self._decode_step(
            self.params, self.stacked, self.cache, tokens, positions, sub
        )
        next_tokens = np.asarray(next_tokens)

        for slot, request in enumerate(self.slot_request):
            if request is None:
                continue
            token = int(next_tokens[slot])
            request.generated.append(token)
            self.slot_pos[slot] += 1
            self.slot_token[slot] = token
            if (
                len(request.generated) >= request.max_new_tokens
                or (request.eos_token is not None and token == request.eos_token)
            ):
                request.done = True
                self._done[request.request_id] = request
                self.slot_request[slot] = None

    def run_until_complete(self, max_steps: int = 100_000) -> dict[int, list[int]]:
        steps = 0
        while (self._pending or self.num_active) and steps < max_steps:
            self.step()
            steps += 1
        return {rid: r.generated for rid, r in self._done.items()}

    # -- internals ----------------------------------------------------------

    def _admit(self) -> None:
        for slot in range(self.max_batch):
            if not self._pending:
                break
            if self.slot_request[slot] is not None:
                continue
            request = self._pending.pop(0)
            self._start(slot, request)

    def _start(self, slot: int, request: Request) -> None:
        prompt = jnp.asarray(np.asarray(request.prompt, np.int32)[None, :])
        small = StackedKVCache.create(**self._small_cache_template)
        self._key, sub = jax.random.split(self._key)
        first_token, small = self._prefill(
            self.params, self.stacked, small, prompt, sub
        )
        self.cache = self._scatter_slot(self.cache, small, slot)
        token = int(np.asarray(first_token)[0])
        request.generated.append(token)
        self.slot_request[slot] = request
        self.slot_pos[slot] = len(request.prompt)
        self.slot_token[slot] = token
