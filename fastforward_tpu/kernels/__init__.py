from fastforward_tpu.kernels.matmul import (
    convert_two_level,
    dequantize_int4,
    matmul_w4a8_gemv,
    matmul_w4_gemv,
    matmul_w4a8,
    matmul_w4a8_2l_gemv,
    matmul_w4a8_2l_gemv_stacked,
    matmul_w4a8_2l_reference,
    matmul_w4a8_reference,
    matmul_w4a16,
    matmul_w4a16_reference,
    matmul_w8a8,
    matmul_w8a8_reference,
    quantize_rowwise,
)
from fastforward_tpu.kernels.attention import flash_decode_int8, flash_decode_int8_reference
from fastforward_tpu.kernels.packing import (
    pack_int4,
    pack_uint4_offset,
    unpack_int4,
    unpack_uint4_offset,
)
from fastforward_tpu.kernels import dispatch as _dispatch  # noqa: F401  (registers kernels)

__all__ = [
    "matmul_w8a8",
    "matmul_w8a8_reference",
    "matmul_w4a8",
    "matmul_w4a8_gemv",
    "dequantize_int4",
    "matmul_w4_gemv",
    "matmul_w4a8_reference",
    "matmul_w4a16",
    "matmul_w4a16_reference",
    "quantize_rowwise",
    "convert_two_level",
    "matmul_w4a8_2l_gemv",
    "matmul_w4a8_2l_gemv_stacked",
    "matmul_w4a8_2l_reference",
    "pack_int4",
    "pack_uint4_offset",
    "flash_decode_int8",
    "flash_decode_int8_reference",
    "unpack_int4",
    "unpack_uint4_offset",
]
