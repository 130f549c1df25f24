"""QuantizedArray — the TPU-native counterpart of the reference's
`QuantizedTensor` (`src/fastforward/quantized_tensor.py:276-584`).

JAX has no tensor subclassing, so instead of a `__torch_function__` subclass
this is a *registered pytree dataclass*: raw integer-grid data plus a
`QuantizationContext` (quantization function + parameters). It flows through
`jax.jit`, `grad`, `vmap` and shardings like any other pytree; interception
of operations happens at the functional-op layer (`fastforward_tpu.ops`)
rather than per-tensor-method, which is strictly stronger on TPU: the check
happens once at trace time and costs nothing per step.

Python operators (`+`, `*`, `@`, ...) are provided for ergonomic parity and
route through the quantized-op dispatcher, including the strict-quantization
error/dequantize-fallback semantics of the reference
(`quantized_tensor.py:447-549`).
"""

from typing import Any

import jax
import jax.numpy as jnp

from fastforward_tpu.quantization.function import QuantizationContext


class QuantizedArray:
    """An array carrying quantized (integer-grid) data + quantization context."""

    __slots__ = ("_data", "_context")

    def __init__(self, data: jax.Array, context: QuantizationContext):
        self._data = data
        self._context = context

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        return (self._data, self._context), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, context = children
        obj = object.__new__(cls)
        obj._data = data
        obj._context = context
        return obj

    # -- metadata ----------------------------------------------------------

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._data.shape)

    @property
    def ndim(self) -> int:
        return self._data.ndim

    @property
    def size(self) -> int:
        return self._data.size

    @property
    def dtype(self):
        """The dequantized dtype (what this array *represents*)."""
        params = self._context.quantization_params
        dd = getattr(params, "dequantize_dtype", None)
        if dd is not None:
            return jnp.dtype(dd)
        if jnp.issubdtype(self._data.dtype, jnp.floating):
            return self._data.dtype
        return jnp.dtype(jnp.float32)

    @property
    def quantized_dtype(self):
        """The storage dtype of the raw grid values."""
        return self._data.dtype

    @property
    def raw_data(self) -> jax.Array:
        """The raw integer-grid values. Parity: `quantized_tensor.py:404`."""
        return self._data

    @property
    def quantization_context(self) -> QuantizationContext:
        return self._context

    def quant_args(self):
        """The quantization parameters. Parity: `quantized_tensor.py:413`."""
        return self._context.quantization_params

    # -- conversion --------------------------------------------------------

    def dequantize(self) -> jax.Array:
        """Reconstruct the real-valued array. Parity: `quantized_tensor.py:370`."""
        return self._context.dequantize(self._data)

    def with_data(self, data: jax.Array) -> "QuantizedArray":
        """Same quantization context, new raw data (shape-compatible)."""
        return QuantizedArray(data, self._context)

    def with_context(self, context: QuantizationContext) -> "QuantizedArray":
        return QuantizedArray(self._data, context)

    def __jax_array__(self) -> jax.Array:
        """Implicit conversion used when a QuantizedArray reaches a plain
        jnp/lax operation.

        Mirrors the reference's dequantization fallback
        (`quantized_tensor.py:534-549`): under strict quantization this is an
        error (the op would silently run unquantized); otherwise the array
        dequantizes transparently.
        """
        from fastforward_tpu import flags
        from fastforward_tpu.exceptions import QuantizationError

        if flags.get_strict_quantization():
            raise QuantizationError(
                "A QuantizedArray reached a non-quantized operation, which "
                "would implicitly dequantize it. Use the quantized ops in "
                "fastforward_tpu.ops, call .dequantize() explicitly, or "
                "disable strict quantization."
            )
        return self.dequantize()

    # -- python operators → quantized-op layer -----------------------------

    def _binop(self, name: str, other: Any, reverse: bool = False):
        from fastforward_tpu import ops
        from fastforward_tpu.autoquant import operator_site

        fn = getattr(ops, name)
        quantizer, active = operator_site(name)
        args = (other, self) if reverse else (self, other)
        if active and quantizer is not None:
            return fn(*args, output_quantizer=quantizer)
        return fn(*args)

    def __add__(self, other):
        return self._binop("add", other)

    def __radd__(self, other):
        return self._binop("add", other, reverse=True)

    def __sub__(self, other):
        return self._binop("sub", other)

    def __rsub__(self, other):
        return self._binop("sub", other, reverse=True)

    def __mul__(self, other):
        return self._binop("mul", other)

    def __rmul__(self, other):
        return self._binop("mul", other, reverse=True)

    def __truediv__(self, other):
        return self._binop("div", other)

    def __matmul__(self, other):
        return self._binop("matmul", other)

    def __neg__(self):
        from fastforward_tpu import ops

        return ops.negative(self)

    def __repr__(self) -> str:
        params = self._context.quantization_params
        num_bits = getattr(params, "num_bits", "?")
        return (
            f"QuantizedArray(shape={self.shape}, num_bits={num_bits}, "
            f"storage={self._data.dtype}, fn={self._context.quantization_fn.__name__})"
        )


jax.tree_util.register_pytree_node(
    QuantizedArray,
    lambda qa: qa.tree_flatten(),
    QuantizedArray.tree_unflatten,
)


def is_quantized(value: Any) -> bool:
    return isinstance(value, QuantizedArray)


def dequantize_if_quantized(value: Any) -> Any:
    """Map QuantizedArray → dense array, pass everything else through.

    The building block of the dequantization fallback
    (reference `quantized_tensor.py:534-549`).
    """
    if isinstance(value, QuantizedArray):
        return value.dequantize()
    return value


def apply_quantized(fn, *args: Any, **kwargs: Any) -> Any:
    """Run ``fn`` after dequantizing every QuantizedArray in args/kwargs."""
    args = tuple(dequantize_if_quantized(a) for a in args)
    kwargs = {k: dequantize_if_quantized(v) for k, v in kwargs.items()}
    return fn(*args, **kwargs)
