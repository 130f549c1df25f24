"""Native (C++) runtime bindings.

The serving engine's load-time hot path — quantizing and packing dense
checkpoints into low-bit storage — is implemented in C++
(`native/ffq_native.cc`) with a plain C ABI consumed via ctypes. An 8B
checkpoint conversion touches ~16GB of host memory; the multithreaded native
path runs at host memory bandwidth.

The library is built lazily on first use (`make -C native`) and every entry
point has a numpy fallback, so nothing here is load-bearing for
correctness — only for load latency.
"""

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libffq_native.so")


@functools.lru_cache(maxsize=1)
def _load_library() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)

    lib.ffq_quantize_pack_int4_f32.argtypes = [f32p, i64, i64, i64, i8p, f32p]
    lib.ffq_quantize_pack_int4_f32.restype = None
    lib.ffq_quantize_pack_int4_bf16.argtypes = [u16p, i64, i64, i64, i8p, f32p]
    lib.ffq_quantize_pack_int4_bf16.restype = None
    lib.ffq_quantize_int8_f32.argtypes = [f32p, i64, i64, i8p, f32p]
    lib.ffq_quantize_int8_f32.restype = None
    return lib


def native_available() -> bool:
    return _load_library() is not None


def quantize_pack_int4(
    w: np.ndarray, group_size: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group symmetric int4 quantize + pack of a (K, N) weight.

    Returns (packed (K//2, N) int8, scales (K//group_size, N) f32). Layout
    matches `fastforward_tpu.kernels.packing.pack_int4`.
    """
    K, N = w.shape
    if K % group_size != 0:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    lib = _load_library()
    if lib is not None and w.dtype in (np.float32, np.dtype("bfloat16") if hasattr(np, "bfloat16") else np.float32):
        packed = np.empty((K // 2, N), np.int8)
        scales = np.empty((K // group_size, N), np.float32)
        if w.dtype == np.float32:
            w = np.ascontiguousarray(w)
            lib.ffq_quantize_pack_int4_f32(
                w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                K, N, group_size,
                packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return packed, scales
        # bf16 path: reinterpret as uint16 words
        raw = np.ascontiguousarray(w).view(np.uint16)
        lib.ffq_quantize_pack_int4_bf16(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            K, N, group_size,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return packed, scales
    return _quantize_pack_int4_numpy(np.asarray(w, np.float32), group_size)


def _quantize_pack_int4_numpy(w: np.ndarray, group_size: int):
    K, N = w.shape
    half = group_size // 2
    wg = w.reshape(K // group_size, group_size, N)
    scales = np.abs(wg).max(axis=1) / 7.0
    scales = np.where(scales > 0, scales, 1e-8).astype(np.float32)
    q = np.clip(np.round(wg / scales[:, None, :]), -8, 7).astype(np.int8)
    packed = (q[:, :half] & 0xF) | (q[:, half:] << 4)
    return packed.reshape(K // 2, N).astype(np.int8), scales


def quantize_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-out-channel symmetric int8 quantize of a (K, N) weight."""
    K, N = w.shape
    lib = _load_library()
    if lib is not None and w.dtype == np.float32:
        w = np.ascontiguousarray(w)
        q = np.empty((K, N), np.int8)
        scales = np.empty((N,), np.float32)
        lib.ffq_quantize_int8_f32(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            K, N,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return q, scales
    w = np.asarray(w, np.float32)
    scales = np.abs(w).max(axis=0) / 127.0
    scales = np.where(scales > 0, scales, 1e-8).astype(np.float32)
    q = np.clip(np.round(w / scales[None, :]), -128, 127).astype(np.int8)
    return q, scales
