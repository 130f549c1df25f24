"""Global context flags.

TPU-native re-design of the reference flag system
(`src/fastforward/flags.py:28-106`): each flag has a getter, setter, and
context-manager triple. Unlike the reference (plain module globals mutated in
eager mode), these are backed by `contextvars.ContextVar` so they compose with
nested contexts and are read at *trace time* — the flag value in effect while
`jax.jit` traces a function is baked into the jaxpr, which makes strict
quantization a trace-time (compile-time) check rather than a per-call runtime
cost.
"""

import contextlib
import functools
from contextvars import ContextVar
from typing import Any, Callable, Iterator, TypeVar

_T = TypeVar("_T")

_FLAGS: dict[str, ContextVar[bool]] = {}


def _context_flag(
    name: str, default: bool
) -> tuple[Callable[[], bool], Callable[[bool], None], Callable[[bool], Any]]:
    """Create a (getter, setter, context-manager) triple for a boolean flag.

    Parity: reference `flags.py:28-58`.
    """
    var: ContextVar[bool] = ContextVar(name, default=default)
    _FLAGS[name] = var

    def getter() -> bool:
        return var.get()

    def setter(value: bool) -> None:
        var.set(bool(value))

    @contextlib.contextmanager
    def manager(value: bool = True) -> Iterator[None]:
        token = var.set(bool(value))
        try:
            yield
        finally:
            var.reset(token)

    getter.__name__ = f"get_{name}"
    setter.__name__ = f"set_{name}"
    manager.__name__ = name  # type: ignore[attr-defined]
    return getter, setter, manager


def context(flag_manager: Callable[[bool], Any], value: bool = True) -> Callable[..., Any]:
    """Decorator running the wrapped function under ``flag_manager(value)``.

    Parity: reference `flags.py:61-81`.
    """

    def decorator(func: Callable[..., _T]) -> Callable[..., _T]:
        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> _T:
            with flag_manager(value):
                return func(*args, **kwargs)

        return wrapper

    return decorator


# Strict quantization (default True): operators raise `QuantizationError` when
# an input declared Quantized is not a QuantizedArray or when no output
# quantizer is provided. Reference `flags.py:84`.
get_strict_quantization, set_strict_quantization, strict_quantization = _context_flag(
    "strict_quantization", default=True
)

# Export mode (default False): quantizers emit quantize->dequantize'd *plain*
# arrays instead of QuantizedArray so the whole model stages out as a single
# dense-dtype StableHLO graph. Reference `flags.py:90`.
get_export_mode, set_export_mode, export_mode = _context_flag("export_mode", default=False)

# Kernel execution tier (default True): when True, quantized operators may
# dispatch to Pallas low-bit kernels; when False, everything runs through the
# simulation tier (pure-jnp fake quantization). The reference's analogous
# switch is `compiled_quant_funcs` (`flags.py:96`) which toggles torch.compile.
get_use_kernels, set_use_kernels, use_kernels = _context_flag("use_kernels", default=True)


# ---------------------------------------------------------------------------
# Environment knobs (A/B switches for the serving/kernel hot path)
# ---------------------------------------------------------------------------
#
# Every FF_* environment switch in the package is declared HERE — kernels and
# serving code import these accessors instead of reading `os.environ` inline
# (round-1 review flagged 19 scattered reads, several numerics-affecting).
# Knobs are read at call time (not import time) so tests can monkeypatch the
# environment, but there is exactly one definition per knob: name, type,
# default, and what it selects.
#
# IMPORTANT: the at-rest nibble layout (`paired`) is a property of the DATA —
# `QuantLinear.paired` / explicit packer arguments — never of the environment.
# `default_paired_layout()` below is consulted only at *pack/freeze time* to
# choose the layout for newly packed weights; decode kernels receive the
# layout from the caller.

import os as _os


def _env_bool(name: str, default: bool) -> bool:
    raw = _os.environ.get(name)
    if raw is None:
        return default
    return raw == "1"


def _env_int(name: str, default: int) -> int:
    raw = _os.environ.get(name)
    return default if raw is None else int(raw)


def _env_str(name: str, default: str) -> str:
    return _os.environ.get(name, default)


def default_paired_layout() -> bool:
    """Pack-time default for the two-level W4 nibble layout (FF_2L_PAIRED).

    True → `pack_uint4_offset_paired` (adjacent-group pairing, concat-free
    GEMV); False → group-halves layout. Only consulted when packing new
    weights; decode always follows the layout recorded on the data.
    """
    return _env_bool("FF_2L_PAIRED", True)


def two_level_block_n() -> int:
    """N-panel width for the two-level GEMV kernels (FF_2L_BLOCK_N)."""
    return _env_int("FF_2L_BLOCK_N", 512)


def two_level_concat() -> int:
    """Max K-adjacent groups folded per MXU dot, halves layout (FF_2L_CONCAT)."""
    return _env_int("FF_2L_CONCAT", 1)


def two_level_nofold() -> bool:
    """Debug: skip the SWAR scale fold in the halves kernel (FF_2L_NOFOLD)."""
    return _env_bool("FF_2L_NOFOLD", False)


def two_level_dotraw() -> bool:
    """Stacked GEMV variant: dot raw nibbles, scale on the accumulator
    (FF_2L_DOTRAW; measured no-win, default off)."""
    return _env_bool("FF_2L_DOTRAW", False)


def a4_nomul() -> bool:
    """W4A4 GEMV DIAGNOSTIC: skip the per-group accumulator multiplier
    (FF_A4_NOMUL; wrong numerics — isolates the VPU cost of m_g * d)."""
    return _env_bool("FF_A4_NOMUL", False)


def a4_concat() -> int:
    """W4A4 GEMV DIAGNOSTIC: concatenate this many groups per int4 dot
    (FF_A4_CONCAT, default 1). >1 applies the FIRST group's multiplier to
    the whole concatenated dot — wrong numerics; measures the dot-issue
    ceiling with 4x/8x longer dots."""
    return _env_int("FF_A4_CONCAT", 1)


def two_level_pargrid() -> bool:
    """Stacked GEMV variant: parallel-N grid (FF_2L_PARGRID; no-win, off)."""
    return _env_bool("FF_2L_PARGRID", False)


def kv_write_mode() -> str:
    """Decode KV append strategy: kernel | mask | scatter (FF_KV_WRITE)."""
    return _env_str("FF_KV_WRITE", "kernel")


def kv_stacked_mode() -> str:
    """Stacked-KV carry flow: 1 | 0 | force (FF_KV_STACKED)."""
    return _env_str("FF_KV_STACKED", "1")


def prefill_stacked() -> bool:
    """Prefill with the KV cache riding the layer-scan carry (in-place
    block writes) instead of xs/ys slab slices. The slab xs/ys structure
    costs ~1.5x the cache size in XLA temporaries (measured 6 GiB at 8B
    batch 128) — the allocation that capped the r3 batch ceiling
    (FF_PREFILL_STACKED)."""
    return _env_bool("FF_PREFILL_STACKED", True)


def use_flash_attention() -> bool:
    """Flash-decode attention vs XLA dequant attention (FF_BENCH_FLASH)."""
    return _env_bool("FF_BENCH_FLASH", True)


def flash_allheads() -> bool:
    """Fold all KV heads into one flash grid step (FF_FLASH_ALLHEADS)."""
    return _env_bool("FF_FLASH_ALLHEADS", True)


def flash_batched() -> bool:
    """Head-batched dot_general flash kernel (FF_FLASH_BATCHED)."""
    return _env_bool("FF_FLASH_BATCHED", True)


def flash_clamp() -> bool:
    """Clamp flash S-blocking to the live length (FF_FLASH_CLAMP; off)."""
    return _env_bool("FF_FLASH_CLAMP", False)


def fused_argmax() -> bool:
    """Fused GEMV+argmax greedy lm_head (FF_FUSED_ARGMAX).

    Default ON since r4: bit-identical tokens, neutral at batch 8/32, but
    +3-4% at batch 192 (8,100 -> 8,389 tok/s/chip) — the (B, 128k) fp32
    logits tensor is 98 MB at batch 192 and its write+read+argmax round
    trip stops being noise once the per-layer costs amortize over large
    batches."""
    return _env_bool("FF_FUSED_ARGMAX", True)


def fused_ogu() -> bool:
    """Large-batch split-fused layer tail: o_proj + residual + norm +
    requant + gate/up in ONE pallas_call (silu/requant/down stay outside).
    Applies where the full fused tail cannot fit VMEM (bm > 64); removes
    the o->gateup call boundary + the norm/requant XLA glue
    (FF_FUSED_OGU)."""
    return _env_bool("FF_FUSED_OGU", False)


def flash_ragged_xseq() -> bool:
    """Cross-sequence DMA pipelining in the ragged flash-decode kernel:
    scratch-resident double buffers + a global block counter keep the next
    sequence's first block in flight while the current one computes, so the
    pipeline never drains at sequence boundaries (FF_RAGGED_XSEQ)."""
    return _env_bool("FF_RAGGED_XSEQ", True)


def two_level_skipfold() -> bool:
    """DIAGNOSTIC ONLY (wrong numerics): skip the SWAR fold in the stacked
    GEMV and dot the raw packed bytes (FF_2L_SKIPFOLD) — isolates the VPU
    fold cost from DMA+MXU in A/B timing runs."""
    return _env_bool("FF_2L_SKIPFOLD", False)


def two_level_skipdot() -> bool:
    """DIAGNOSTIC ONLY (wrong numerics): skip all but the first pair's dots
    in the stacked GEMV (FF_2L_SKIPDOT) — pure-DMA pipeline ceiling."""
    return _env_bool("FF_2L_SKIPDOT", False)


def two_level_concat_pairs() -> int:
    """Adjacent pair blocks folded+concatenated per MXU dot in the stacked
    paired GEMV (FF_2L_CONCAT_PAIRS, default 1 = one dot per plane)."""
    return _env_int("FF_2L_CONCAT_PAIRS", 1)


def use_flash_prefill() -> bool:
    """Blocked flash prefill attention vs dense (T, S) einsum+mask
    (FF_FLASH_PREFILL)."""
    return _env_bool("FF_FLASH_PREFILL", True)


def fused_layer() -> bool:
    """One-pallas_call o+MLP layer tail in the stacked decode loop
    (FF_FUSED_LAYER). Default on: whole-loop A/B on real TPU (round 3)
    measured batch 32: 2940->3104..3153 tok/s (+6-7%), batch 8: 909->929
    (+2.2%); see docs/performance.md "Round 3"."""
    return _env_bool("FF_FUSED_LAYER", True)


def flash_ragged_mode() -> str:
    """Length-aware flash decode in the stacked path: one grid step per
    sequence with a dynamic-trip-count manual-DMA pipeline — O(true length)
    cache reads instead of O(S). FF_FLASH_RAGGED = auto|1|0. "auto"
    (default) selects it when the cache slab S >= 1024: measured on 8B
    batch-64/128 with ~160-token live lengths, ragged is -6% at S=512
    (n_blocks=1, no DMA overlap to hide), +14% at S=1024, +42% at S=2048
    (docs/performance.md r3)."""
    return _os.environ.get("FF_FLASH_RAGGED", "auto")


def flash_bucketed_mode() -> str:
    """Bucketed-S flash decode in the stacked path: ``lax.switch`` over
    static block-prefix grids (s_blocks=1..n) picked from the batch's max
    live length each step, so the whole-S kernel only DMAs live 256-token
    blocks. FF_FLASH_BUCKETED = auto|1|0. "auto" (default) enables it for
    slabs 512 <= S < 1024 (the regime the ragged kernel loses: one block
    per sequence leaves no DMA overlap; a smaller *grid* needs none)."""
    return _os.environ.get("FF_FLASH_BUCKETED", "auto")


def fused_qkv() -> bool:
    """One-pallas_call input-norm + requant + qkv GEMV layer head in the
    stacked decode loop (FF_FUSED_QKV)."""
    return _env_bool("FF_FUSED_QKV", False)


def two_level_preblock() -> bool:
    """Pre-blocked stacked weight layout (L, N//bn, K//2, bn): each decode
    GEMV grid step's weight panel is one contiguous HBM chunk instead of
    K//2 strided rows (FF_2L_PREBLOCK). Applied at `fuse_stacked_layers`
    time; the layout is carried by the array's ndim, never re-derived."""
    return _env_bool("FF_2L_PREBLOCK", False)


def two_level_buffers() -> int:
    """Pipeline buffer count for the stacked GEMV weight operand
    (FF_2L_BUFFERS, default 2 = plain double buffering).

    KNOWN-BROKEN above 2 on this toolchain: `pl.Buffered` pipeline_mode
    dies inside pallas lowering (KeyError 'closed_call', r4) — deeper
    weight buffering needs a manual-DMA kernel instead."""
    return _env_int("FF_2L_BUFFERS", 2)


def two_level_manual_bufs() -> int:
    """Manual multi-buffered weight DMA for the stacked 2L GEMV: number of
    scratch panel slots, 0 = off (FF_2L_MANUAL). Requires the preblocked
    (L, N//bn, K//2, bn) weight layout; see
    `_w4a8_2l_gemv_stacked_manual_kernel`."""
    return _env_int("FF_2L_MANUAL", 0)


def two_level_lookahead() -> bool:
    """Enable pipeline lookahead on the stacked GEMV weight operand
    (FF_2L_LOOKAHEAD)."""
    return _env_bool("FF_2L_LOOKAHEAD", False)


def two_level_split_w() -> bool:
    """Split the stacked GEMV weight operand into two half-K BlockSpec
    operands → two concurrent DMA streams (FF_2L_SPLITW)."""
    return _env_bool("FF_2L_SPLITW", False)
