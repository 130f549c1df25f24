"""The quantized operator library.

Parity: reference operator spec `src/fastforward/_quantops/quantized_operators.yaml`
(48 ops) and the generated wrappers `src/fastforward/_gen/{operators,fallback}.py`.
Each function body is the dense jnp implementation (the fallback tier); the
`@quantized_op` decorator adds dispatch, strict checks, dequantization and the
``output_quantizer`` slot.

Conventions (TPU-native, documented deviations from torch):
  - `linear` takes the kernel in (in_features, out_features) layout — the
    JAX/flax convention — and computes ``x @ kernel + bias``.
  - Convolutions are channels-last (NHWC / NLC / NDHWC), the native TPU
    layout, with kernels in (spatial..., in, out) layout.
  - `dropout` takes an explicit PRNG key (JAX has no global RNG state).
"""

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from fastforward_tpu.ops.optable import quantized_op

Array = jax.Array


# --- matmul family -----------------------------------------------------------


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def linear(input: Array, kernel: Array, bias: Optional[Array] = None) -> Array:
    """``input @ kernel (+ bias)``; kernel is (in_features, out_features).

    Parity: reference yaml `quantized_operators.yaml:1-2` (torch layout
    differs; see module docstring).
    """
    out = jnp.matmul(input, kernel)
    if bias is not None:
        out = out + bias
    return out


@quantized_op(quantized=("input", "other"), aliases=("jnp.matmul", "jax.numpy.matmul"))
def matmul(input: Array, other: Array) -> Array:
    return jnp.matmul(input, other)


@quantized_op(quantized=("input", "mat2"))
def mm(input: Array, mat2: Array) -> Array:
    return jnp.matmul(input, mat2)


@quantized_op(quantized=("input", "mat2"))
def bmm(input: Array, mat2: Array) -> Array:
    return jnp.matmul(input, mat2)


@quantized_op(quantized=("input",), aliases=("jnp.einsum", "jax.numpy.einsum"))
def einsum(equation: str, input: Array, other: Optional[Array] = None) -> Array:
    """General 1-/2-operand einsum (the overwhelmingly common forms in
    model code; >2 operands fall back to `jnp.einsum` unquantized via the
    caller). Reference parity: arbitrary-call rewriting covers einsum
    (`_autoquant/cst/passes.py:703`)."""
    if other is None:
        return jnp.einsum(equation, input)
    return jnp.einsum(equation, input, other)


@quantized_op(quantized=("input",), aliases=("jax.nn.log_softmax",))
def log_softmax(input: Array, dim: int = -1, dtype: Any = None) -> Array:
    x = input.astype(dtype) if dtype is not None else input
    return jax.nn.log_softmax(x, axis=dim)


@quantized_op(quantized=("input", "weight"), maybe_quantized=("bias",))
def einsum_linear(equation: str, input: Array, weight: Array, bias: Optional[Array] = None) -> Array:
    """Generalized projection via einsum (used by fused attention layers)."""
    out = jnp.einsum(equation, input, weight)
    if bias is not None:
        out = out + bias
    return out


# --- convolutions (channels-last) -------------------------------------------


def _conv_nd(
    input: Array,
    kernel: Array,
    bias: Optional[Array],
    stride,
    padding,
    dilation,
    groups: int,
    ndim: int,
    transpose: bool = False,
) -> Array:
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(dilation, int):
        dilation = (dilation,) * ndim
    if isinstance(padding, int):
        padding = [(padding, padding)] * ndim
    elif isinstance(padding, str):
        padding = padding.upper()
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]

    spatial = "DHW"[-ndim:]
    lhs_spec = "N" + spatial + "C"
    rhs_spec = spatial + "IO"
    out_spec = lhs_spec
    dn = jax.lax.conv_dimension_numbers(
        input.shape, kernel.shape, (lhs_spec, rhs_spec, out_spec)
    )
    if transpose:
        out = jax.lax.conv_transpose(
            input, kernel, strides=tuple(stride), padding=padding,
            rhs_dilation=tuple(dilation), dimension_numbers=dn,
        )
    else:
        out = jax.lax.conv_general_dilated(
            input, kernel, window_strides=tuple(stride), padding=padding,
            rhs_dilation=tuple(dilation), dimension_numbers=dn,
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias
    return out


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv1d(input, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    """NLC input, (L, in, out) kernel. Parity: yaml conv1d."""
    return _conv_nd(input, kernel, bias, stride, padding, dilation, groups, 1)


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv2d(input, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    """NHWC input, (H, W, in, out) kernel. Parity: yaml conv2d."""
    return _conv_nd(input, kernel, bias, stride, padding, dilation, groups, 2)


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv3d(input, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    return _conv_nd(input, kernel, bias, stride, padding, dilation, groups, 3)


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv_transpose1d(input, kernel, bias=None, stride=1, padding=0, output_padding=0, groups=1, dilation=1):
    del output_padding, groups
    return _conv_nd(input, kernel, bias, stride, padding, dilation, 1, 1, transpose=True)


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv_transpose2d(input, kernel, bias=None, stride=1, padding=0, output_padding=0, groups=1, dilation=1):
    del output_padding, groups
    return _conv_nd(input, kernel, bias, stride, padding, dilation, 1, 2, transpose=True)


@quantized_op(quantized=("input", "kernel"), maybe_quantized=("bias",))
def conv_transpose3d(input, kernel, bias=None, stride=1, padding=0, output_padding=0, groups=1, dilation=1):
    del output_padding, groups
    return _conv_nd(input, kernel, bias, stride, padding, dilation, 1, 3, transpose=True)


# --- activations / normalization --------------------------------------------


@quantized_op(quantized=("input",), aliases=("jax.nn.softmax",))
def softmax(input: Array, dim: int = -1, dtype: Any = None) -> Array:
    x = input.astype(dtype) if dtype is not None else input
    return jax.nn.softmax(x, axis=dim)


@quantized_op(quantized=("input",), aliases=("jax.nn.relu",))
def relu(input: Array) -> Array:
    return jax.nn.relu(input)


@quantized_op(quantized=("input",), aliases=("jax.nn.sigmoid",))
def sigmoid(input: Array) -> Array:
    return jax.nn.sigmoid(input)


@quantized_op(quantized=("input",), aliases=("jax.nn.silu", "jax.nn.swish"))
def silu(input: Array) -> Array:
    return jax.nn.silu(input)


@quantized_op(quantized=("input",), aliases=("jax.nn.gelu",))
def gelu(input: Array, approximate: str = "none") -> Array:
    return jax.nn.gelu(input, approximate=approximate != "none")


@quantized_op(quantized=("input",), aliases=("jax.nn.tanh", "jnp.tanh"))
def tanh(input: Array) -> Array:
    return jnp.tanh(input)


@quantized_op(quantized=("input",), maybe_quantized=("weight", "bias"))
def layer_norm(
    input: Array,
    normalized_shape: Sequence[int],
    weight: Optional[Array] = None,
    bias: Optional[Array] = None,
    eps: float = 1e-5,
) -> Array:
    axes = tuple(range(input.ndim - len(tuple(normalized_shape)), input.ndim))
    mean = jnp.mean(input, axis=axes, keepdims=True)
    var = jnp.var(input, axis=axes, keepdims=True)
    out = (input - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


@quantized_op(quantized=("input",), maybe_quantized=("weight",))
def rms_norm(input: Array, weight: Optional[Array] = None, eps: float = 1e-6) -> Array:
    """RMSNorm (TPU-native addition — needed by the Llama family; the
    reference models it through autoquant of HF source)."""
    dtype = input.dtype
    x = input.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    out = x * jax.lax.rsqrt(var + eps)
    out = out.astype(dtype)
    if weight is not None:
        out = out * weight
    return out


@quantized_op(quantized=("weight",))
def embedding(
    input: Array,
    weight: Array,
    padding_idx: Optional[int] = None,
    max_norm: Optional[float] = None,
) -> Array:
    del padding_idx, max_norm
    return jnp.take(weight, input, axis=0)


# --- elementwise binary ------------------------------------------------------


@quantized_op(quantized=("input",), maybe_quantized=("other",), aliases=("jnp.add",))
def add(input, other, alpha=1):
    return input + alpha * other if alpha != 1 else input + other


@quantized_op(quantized=("input",), maybe_quantized=("other",), aliases=("jnp.subtract",))
def sub(input, other, alpha=1):
    return input - alpha * other if alpha != 1 else input - other


@quantized_op(quantized=("input",), maybe_quantized=("other",), aliases=("jnp.multiply",))
def mul(input, other):
    return input * other


@quantized_op(quantized=("input",), maybe_quantized=("other",), aliases=("jnp.divide",))
def div(input, other):
    return input / other


@quantized_op(quantized=("input",), maybe_quantized=("exponent",))
def pow(input, exponent):
    return input**exponent


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def floor_divide(input, other):
    return jnp.floor_divide(input, other)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def remainder(input, other):
    return jnp.remainder(input, other)


@quantized_op(quantized=("input",))
def negative(input):
    return -input


@quantized_op(quantized=("input",))
def positive(input):
    return +input


@quantized_op(quantized=("input",))
def sum(input, dim: Optional[int] = None):
    return jnp.sum(input, axis=dim)


@quantized_op(quantized=("input",))
def cumsum(input, dim: int):
    return jnp.cumsum(input, axis=dim)


# --- bitwise (operate on integer grids) -------------------------------------


@quantized_op(quantized=("input",))
def bitwise_not(input):
    return jnp.bitwise_not(input)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def bitwise_and(input, other):
    return jnp.bitwise_and(input, other)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def bitwise_or(input, other):
    return jnp.bitwise_or(input, other)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def bitwise_xor(input, other):
    return jnp.bitwise_xor(input, other)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def bitwise_left_shift(input, other):
    return jnp.left_shift(input, other)


@quantized_op(quantized=("input",), maybe_quantized=("other",))
def bitwise_right_shift(input, other):
    return jnp.right_shift(input, other)


# --- shape / layout ----------------------------------------------------------


@quantized_op(quantized=("input",))
def permute(input, dims: Sequence[int]):
    return jnp.transpose(input, axes=tuple(dims))


@quantized_op(quantized=("input",))
def transpose(input, dim0: int, dim1: int):
    return jnp.swapaxes(input, dim0, dim1)


@quantized_op(quantized=("input",))
def reshape(input, shape: Sequence[int]):
    return jnp.reshape(input, tuple(shape))


@quantized_op(quantized=("tensors",))
def cat(tensors: Sequence[Array], dim: int = 0):
    return jnp.concatenate(list(tensors), axis=dim)


@quantized_op(quantized=("input", "source"))
def index_add(input, dim: int, index: Array, source: Array, alpha: float = 1):
    moved = jnp.moveaxis(input, dim, 0)
    src = jnp.moveaxis(source, dim, 0)
    out = moved.at[index].add(alpha * src)
    return jnp.moveaxis(out, 0, dim)


@quantized_op(quantized=("input",))
def pad(input, pad: Sequence[int], mode: str = "constant", value: Optional[float] = None):
    # torch-style pad list: last dim first, (before, after) pairs.
    pairs = [(0, 0)] * input.ndim
    for i in range(len(pad) // 2):
        dim = input.ndim - 1 - i
        pairs[dim] = (pad[2 * i], pad[2 * i + 1])
    if mode == "constant":
        return jnp.pad(input, pairs, mode="constant", constant_values=value or 0)
    jnp_mode = {"reflect": "reflect", "replicate": "edge", "circular": "wrap"}[mode]
    return jnp.pad(input, pairs, mode=jnp_mode)


# --- pooling / resampling ----------------------------------------------------


def _pool(input, kernel_size, stride, padding, ndim, reducer, init, count_include_pad=True):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    if stride is None:
        stride = kernel_size
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(padding, int):
        padding = (padding,) * ndim

    window = (1,) + tuple(kernel_size) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    out = jax.lax.reduce_window(input, init, reducer, window, strides, pads)
    return out, kernel_size


@quantized_op(quantized=("input",))
def avg_pool1d(input, kernel_size, stride=None, padding=0, ceil_mode=False, count_include_pad=True):
    del ceil_mode
    out, ks = _pool(input, kernel_size, stride, padding, 1, jax.lax.add, 0.0)
    return out / math.prod(ks if isinstance(ks, tuple) else (ks,))


@quantized_op(quantized=("input",))
def avg_pool2d(input, kernel_size, stride=None, padding=0, ceil_mode=False, count_include_pad=True):
    del ceil_mode
    out, ks = _pool(input, kernel_size, stride, padding, 2, jax.lax.add, 0.0)
    return out / math.prod(ks)


@quantized_op(quantized=("input",))
def avg_pool3d(input, kernel_size, stride=None, padding=0, ceil_mode=False, count_include_pad=True):
    del ceil_mode
    out, ks = _pool(input, kernel_size, stride, padding, 3, jax.lax.add, 0.0)
    return out / math.prod(ks)


@quantized_op(quantized=("input",))
def max_pool2d(input, kernel_size, stride=None, padding=0, dilation=1, ceil_mode=False):
    del dilation, ceil_mode
    out, _ = _pool(input, kernel_size, stride, padding, 2, jax.lax.max, -jnp.inf)
    return out


@quantized_op(quantized=("input",))
def interpolate(
    input,
    size=None,
    scale_factor=None,
    mode: str = "nearest",
    align_corners=None,
    recompute_scale_factor=None,
    antialias: bool = False,
):
    del align_corners, recompute_scale_factor
    spatial = input.shape[1:-1]
    if size is None:
        if isinstance(scale_factor, (int, float)):
            scale_factor = (scale_factor,) * len(spatial)
        size = tuple(int(s * f) for s, f in zip(spatial, scale_factor))
    elif isinstance(size, int):
        size = (size,) * len(spatial)
    new_shape = (input.shape[0],) + tuple(size) + (input.shape[-1],)
    method = {"nearest": "nearest", "bilinear": "bilinear", "linear": "bilinear",
              "bicubic": "cubic", "trilinear": "trilinear"}.get(mode, mode)
    return jax.image.resize(input, new_shape, method=method, antialias=antialias)


@quantized_op(quantized=("input",))
def unfold(input, kernel_size, dilation=1, padding=0, stride=1):
    """Extract sliding patches (im2col), NHWC input → (N, L, patch_elems)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = (padding, padding)
    patches = jax.lax.conv_general_dilated_patches(
        jnp.moveaxis(input, -1, 1),
        filter_shape=kernel_size,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
    )
    n, c, h, w = patches.shape
    return patches.reshape(n, c, h * w)


# --- dropout / constructors --------------------------------------------------


@quantized_op(quantized=("input",))
def dropout(input, p: float = 0.5, training: bool = True, *, rng: Optional[jax.Array] = None):
    if not training or p == 0.0:
        return input
    if rng is None:
        raise ValueError("dropout requires an explicit PRNG key via rng= when training")
    keep = jax.random.bernoulli(rng, 1.0 - p, input.shape)
    return jnp.where(keep, input / (1.0 - p), 0.0)


@quantized_op(quantized=("input",))
def ones_like(input, dtype=None):
    return jnp.ones_like(input, dtype=dtype)


@quantized_op(quantized=("input",))
def zeros_like(input, dtype=None):
    return jnp.zeros_like(input, dtype=dtype)


@quantized_op(quantized=("input",))
def full_like(input, fill_value, dtype=None):
    return jnp.full_like(input, fill_value, dtype=dtype)


@quantized_op(quantized=("input",))
def empty_like(input, dtype=None):
    return jnp.empty_like(input, dtype=dtype)
