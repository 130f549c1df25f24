"""The 2-layer MLP of BASELINE config 1 (per-tensor INT8 parity milestone)."""

from flax import nnx


class MLP(nnx.Module):
    def __init__(self, din: int = 128, dhidden: int = 512, dout: int = 128, *, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(din, dhidden, rngs=rngs)
        self.fc2 = nnx.Linear(dhidden, dout, rngs=rngs)

    def __call__(self, x):
        from fastforward_tpu import ops
        from fastforward_tpu.quantization.quantized_array import QuantizedArray

        h = self.fc1(x)
        if isinstance(h, QuantizedArray):
            h = ops.relu(h, strict_quantization=False)
        else:
            import jax

            h = jax.nn.relu(h)
        return self.fc2(h)
