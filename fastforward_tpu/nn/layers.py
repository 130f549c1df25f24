"""Quantized counterparts of flax NNX layers.

Parity: reference `src/fastforward/nn/{linear,conv,activations,normalization,
embedding}.py` — each counterpart installs input/weight/bias/output quantizer
stubs in `__init_quantization__` and routes its forward through
`fastforward_tpu.ops` (the canonical pattern of reference `nn/linear.py:12-39`).

Registered against the *flax NNX* layer types, so any NNX model converts via
`quantize_model` without modification.
"""

from typing import Any

from flax import nnx

from fastforward_tpu import ops
from fastforward_tpu.nn.quantized_module import QuantizedModule
from fastforward_tpu.nn.quantizer import QuantizerStub


def _param_value(p: Any):
    return None if p is None else p.value


class QuantizedLinear(QuantizedModule, nnx.Linear):
    """Quantized nnx.Linear. Reference pattern: `nn/linear.py:12-39`."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.bias_quantizer = QuantizerStub(bias_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        kernel = self.weight_quantizer(self.kernel.value)
        bias = _param_value(self.bias)
        if bias is not None:
            bias = self.bias_quantizer(bias)
        return ops.linear(x, kernel, bias, output_quantizer=self.output_quantizer)


class QuantizedEinsum(QuantizedModule, nnx.Einsum):
    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.bias_quantizer = QuantizerStub(bias_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        kernel = self.weight_quantizer(self.kernel.value)
        bias = _param_value(self.bias)
        if bias is not None:
            bias = self.bias_quantizer(bias)
        return ops.einsum_linear(
            self.einsum_str, x, kernel, bias, output_quantizer=self.output_quantizer
        )


class QuantizedConv(QuantizedModule, nnx.Conv):
    """Quantized nnx.Conv (channels-last). Reference: `nn/conv.py:12,51`."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.bias_quantizer = QuantizerStub(bias_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        kernel = self.weight_quantizer(self.kernel.value)
        bias = _param_value(self.bias)
        if bias is not None:
            bias = self.bias_quantizer(bias)
        ndim = len(self.kernel_size)
        op = {1: ops.conv1d, 2: ops.conv2d, 3: ops.conv3d}[ndim]
        return op(
            x,
            kernel,
            bias,
            stride=self.strides,
            padding=self.padding,
            dilation=self.kernel_dilation,
            groups=self.feature_group_count,
            output_quantizer=self.output_quantizer,
        )


class QuantizedEmbed(QuantizedModule, nnx.Embed):
    """Quantized nnx.Embed. Reference: `nn/embedding.py:11`."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        table = self.weight_quantizer(self.embedding.value)
        return ops.embedding(x, table, output_quantizer=self.output_quantizer)


class QuantizedLayerNorm(QuantizedModule, nnx.LayerNorm):
    """Quantized nnx.LayerNorm. Reference: `nn/normalization.py:11`."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.bias_quantizer = QuantizerStub(bias_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        scale = _param_value(self.scale)
        if scale is not None:
            scale = self.weight_quantizer(scale)
        bias = _param_value(self.bias)
        if bias is not None:
            bias = self.bias_quantizer(bias)
        return ops.layer_norm(
            x,
            (x.shape[-1],) if isinstance(self.reduction_axes, int) else
            tuple(x.shape[a] for a in self.reduction_axes),
            scale,
            bias,
            eps=self.epsilon,
            output_quantizer=self.output_quantizer,
        )


class QuantizedRMSNorm(QuantizedModule, nnx.RMSNorm):
    """Quantized nnx.RMSNorm (TPU addition — Llama-family norm)."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.weight_quantizer = QuantizerStub(weight_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        scale = _param_value(self.scale)
        if scale is not None:
            scale = self.weight_quantizer(scale)
        return ops.rms_norm(
            x, scale, eps=self.epsilon, output_quantizer=self.output_quantizer
        )


class QuantizedSequential(QuantizedModule, nnx.Sequential):
    """Container counterpart (reference `nn/container.py:9-25`,
    QuantizedSequential/ModuleList/...). NNX containers hold children as
    pytree attributes, so conversion needs no quantizers of its own — the
    QuantizedModule registration only marks the container as quantized and
    lets `quantize_model` recurse through it without raising on an
    unknown module type. Other reference containers (ModuleList/Dict,
    ParameterList/Dict) have no NNX counterpart: plain lists/dicts are
    already graph nodes that `quantize_model` traverses."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()


class QuantizedRelu(QuantizedModule):
    """Quantized ReLU activation module (reference `nn/activations.py:21`).

    NNX has no activation modules to convert from, so this is instantiated
    directly when writing quantization-aware model definitions; it gives
    the activation its own input/output quantizer slots like the reference
    `QuantizedRelu(QuantizedModule, torch.nn.ReLU)`.
    """

    def __init__(self) -> None:
        self.__init_quantization__()

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        return ops.relu(x, output_quantizer=self.output_quantizer)


class QuantizedSilu(QuantizedModule):
    """Quantized SiLU activation module (reference `nn/activations.py:40`)."""

    def __init__(self) -> None:
        self.__init_quantization__()

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.input_quantizer = QuantizerStub(input_quantizer=True)
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x):
        x = self.input_quantizer(x)
        return ops.silu(x, output_quantizer=self.output_quantizer)


class QuantizedDropout(QuantizedModule, nnx.Dropout):
    """Dropout passes quantized data through when inactive; when active it
    dequantizes (dropout of grid values with rescale leaves the grid)."""

    def __init_quantization__(self) -> None:
        super().__init_quantization__()
        self.output_quantizer = QuantizerStub(output_quantizer=True)

    def __call__(self, x, *args: Any, **kwargs: Any):
        from fastforward_tpu.quantization.quantized_array import QuantizedArray

        if isinstance(x, QuantizedArray):
            if not self.deterministic and self.rate > 0.0:
                return super().__call__(x.dequantize(), *args, **kwargs)
            return x
        return super().__call__(x, *args, **kwargs)
