"""Direct parity against the actual reference FastForward package.

BASELINE.md's north-star accuracy bar — "perplexity delta vs FastForward
simulated-quant reference at same bit-width <= 0.1" — is proven here by
importing the reference (`/root/reference/src`, torch CPU) into the test
process and comparing against it directly, not transitively:

  1. Bit-exact integer-grid parity of `quantize_by_tile` /
     `dequantize_by_tile` / `quantize_dynamic_by_tile` vs
     `torch.ops.fastforward.*` (reference
     `quantization/_quantizer_impl.py:144-285`) across
     per-tensor / per-channel / per-block / per-tile x
     symmetric-style zero offset / asymmetric offsets x bits in {4, 8, 16}.
  2. Bit-exact `parameters_for_range` parity (reference
     `quantization/affine/range.py:54-122`) across symmetric x
     allow_one_sided x one-sided data.
  3. Same-weights model-level perplexity: the reference's
     `quantize_model` + `LinearQuantizer` + `running_minmax` simulation
     stack vs this repo's simulation tier at the identical config, on the
     identical eval set — |delta ppl| <= 0.1 (GPT-2 W8A8 per-channel and
     Llama W4 per-channel weight-only, the BASELINE config-2/3 shapes).

These tests *read* the reference's public API; no reference code is copied.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    """Import the reference fastforward package (torch-backed)."""
    import sys

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    torch = pytest.importorskip("torch")
    ff_ref = pytest.importorskip("fastforward")
    return ff_ref, torch


# ---------------------------------------------------------------------------
# 1. kernel-level bit-exact parity
# ---------------------------------------------------------------------------

# (name, data_shape, tile) — tile=None means "data_shape" (per-tensor).
GRANULARITIES = [
    ("per_tensor", (8, 16), None),
    ("per_channel0", (8, 16), (1, 16)),
    ("per_channel1", (8, 16), (8, 1)),
    ("per_block", (8, 16), (4, 8)),
    ("per_tile", (8, 16), (2, 4)),
    ("per_tile_3d", (4, 6, 8), (2, 3, 4)),
]


def _rand_case(shape, tile, *, with_offset, seed):
    rng = np.random.RandomState(seed)
    data = rng.randn(*shape).astype(np.float32) * 3.0
    tile_concrete = tile if tile is not None else shape
    n_tiles = int(np.prod(shape) // np.prod(tile_concrete))
    scale = (rng.rand(n_tiles).astype(np.float32) * 0.3 + 0.05)
    offset = (
        rng.randn(n_tiles).astype(np.float32) * 3.0 if with_offset else None
    )
    return data, scale, offset, tile_concrete


@pytest.mark.parametrize("num_bits", [4, 8, 16])
@pytest.mark.parametrize("gran,shape,tile", GRANULARITIES)
@pytest.mark.parametrize("with_offset", [False, True])
def test_quantize_by_tile_bit_exact(ref, gran, shape, tile, num_bits, with_offset):
    ff_ref, torch = ref
    from fastforward_tpu.quantization import affine

    data, scale, offset, tile_c = _rand_case(
        shape, tile, with_offset=with_offset, seed=num_bits * 101 + len(shape)
    )

    ref_q = torch.ops.fastforward.quantize_by_tile(
        torch.from_numpy(data),
        torch.from_numpy(scale),
        list(tile_c),
        num_bits,
        None,
        torch.from_numpy(offset) if offset is not None else None,
    ).numpy()

    our_q = np.asarray(
        affine.quantize_by_tile(
            jnp.asarray(data),
            jnp.asarray(scale),
            jnp.asarray(offset) if offset is not None else None,
            tile_size=tile_c,
            num_bits=num_bits,
        ),
        np.float32,
    )

    np.testing.assert_array_equal(
        our_q, ref_q, err_msg=f"grid mismatch: {gran} bits={num_bits}"
    )


@pytest.mark.parametrize("num_bits", [4, 8])
@pytest.mark.parametrize("gran,shape,tile", GRANULARITIES)
def test_dequantize_by_tile_bit_exact(ref, gran, shape, tile, num_bits):
    ff_ref, torch = ref
    from fastforward_tpu.quantization import affine

    data, scale, offset, tile_c = _rand_case(
        shape, tile, with_offset=True, seed=num_bits * 7 + 1
    )
    # Integer grid values as the dequant input.
    qmax = 2 ** (num_bits - 1) - 1
    grid = np.round(
        np.random.RandomState(3).uniform(-qmax - 1, qmax, size=shape)
    ).astype(np.float32)

    ref_d = torch.ops.fastforward.dequantize_by_tile(
        torch.from_numpy(grid),
        torch.from_numpy(scale),
        list(tile_c),
        torch.from_numpy(offset),
        None,
    ).numpy()

    our_d = np.asarray(
        affine.dequantize_by_tile(
            jnp.asarray(grid),
            jnp.asarray(scale),
            jnp.asarray(offset),
            tile_size=tile_c,
        ),
        np.float32,
    )

    np.testing.assert_array_equal(
        our_d, ref_d, err_msg=f"dequant mismatch: {gran} bits={num_bits}"
    )


@pytest.mark.parametrize("num_bits", [4, 8])
@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("allow_one_sided", [False, True])
@pytest.mark.parametrize("gran,shape,tile", GRANULARITIES[:5])
def test_quantize_dynamic_by_tile_bit_exact(
    ref, gran, shape, tile, num_bits, symmetric, allow_one_sided
):
    ff_ref, torch = ref
    from fastforward_tpu.quantization import affine

    rng = np.random.RandomState(num_bits + 17)
    data = rng.randn(*shape).astype(np.float32) * 2.0
    tile_c = tile if tile is not None else shape

    ref_q, ref_s, ref_o = torch.ops.fastforward.quantize_dynamic_by_tile(
        torch.from_numpy(data),
        list(tile_c),
        num_bits,
        symmetric,
        allow_one_sided,
        torch.float32,
    )

    our_q, our_s, our_o = affine.quantize_dynamic_by_tile(
        jnp.asarray(data),
        tile_size=tile_c,
        num_bits=num_bits,
        symmetric=symmetric,
        allow_one_sided=allow_one_sided,
    )

    np.testing.assert_array_equal(np.asarray(our_s), ref_s.numpy())
    np.testing.assert_array_equal(np.asarray(our_o), ref_o.numpy())
    np.testing.assert_array_equal(np.asarray(our_q, np.float32), ref_q.numpy())


@pytest.mark.parametrize("num_bits", [4, 8, 16])
@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("allow_one_sided", [False, True])
@pytest.mark.parametrize("data_kind", ["two_sided", "one_sided", "negative"])
def test_parameters_for_range_bit_exact(
    ref, num_bits, symmetric, allow_one_sided, data_kind
):
    ff_ref, torch = ref
    from fastforward_tpu.quantization import affine

    rng = np.random.RandomState(42)
    lo = rng.rand(12).astype(np.float32) * 4.0
    hi = lo + rng.rand(12).astype(np.float32) * 6.0 + 0.1
    if data_kind == "two_sided":
        lo = -lo - 0.01
    elif data_kind == "negative":
        lo, hi = -hi, -lo

    ref_s, ref_o = ff_ref.quantization.affine.parameters_for_range(
        torch.from_numpy(lo),
        torch.from_numpy(hi),
        num_bits,
        symmetric=symmetric,
        allow_one_sided=allow_one_sided,
    )
    our_s, our_o = affine.parameters_for_range(
        jnp.asarray(lo), jnp.asarray(hi), num_bits,
        symmetric=symmetric, allow_one_sided=allow_one_sided,
    )

    np.testing.assert_array_equal(np.asarray(our_s), ref_s.numpy())
    if ref_o is None:
        assert our_o is None or bool(jnp.all(our_o == 0))
    else:
        assert our_o is not None
        np.testing.assert_array_equal(np.asarray(our_o), ref_o.numpy())


def test_quantization_range_and_integer_grid(ref):
    ff_ref, torch = ref
    from fastforward_tpu.quantization import affine

    for bits in (2, 4, 8, 16):
        assert affine.integer_minimum(bits) == ff_ref.quantization.affine.integer_minimum(bits)
        assert affine.integer_maximum(bits) == ff_ref.quantization.affine.integer_maximum(bits)
    scale = np.float32(0.07)
    offset = np.float32(3.0)
    ref_lo, ref_hi = ff_ref.quantization.affine.quantization_range(
        torch.tensor(scale), torch.tensor(offset), 8
    )
    our_lo, our_hi = affine.quantization_range(scale, offset, 8)
    assert float(our_lo) == float(ref_lo) and float(our_hi) == float(ref_hi)


# ---------------------------------------------------------------------------
# 2. model-level perplexity parity (the <= 0.1 ppl BASELINE bar)
# ---------------------------------------------------------------------------

PPL_TOL = 0.1


def _ref_running_minmax_calibrate(ff_ref, torch, model, calib_ids):
    """Run the reference's running_minmax estimation over one calib batch."""
    from fastforward import range_setting as ref_rs

    with torch.no_grad(), ff_ref.strict_quantization(False):
        with ref_rs.estimate_ranges(model, ref_rs.running_minmax):
            model(torch.from_numpy(calib_ids))


def _ref_ppl(ff_ref, torch, model, ids):
    import torch.nn.functional as F

    with torch.no_grad(), ff_ref.strict_quantization(False):
        logits = model(torch.from_numpy(ids)).logits.float()
    lp = F.log_softmax(logits[:, :-1], dim=-1)
    tgt = torch.from_numpy(ids[:, 1:])
    nll = -lp.gather(-1, tgt.unsqueeze(-1)).squeeze(-1)
    return float(nll.mean().exp())


def test_gpt2_w8a8_ppl_parity_vs_reference(ref):
    """GPT-2 (BASELINE config 2 shape) W8A8: reference `quantize_model` +
    LinearQuantizer simulation vs this repo's simulation tier, identical
    config (weights 8-bit symmetric per-out-channel, inputs 8-bit
    asymmetric per-tensor, running-minmax on the same calibration batch),
    identical weights, identical eval set. |delta ppl| <= 0.1.
    """
    ff_ref, torch = ref
    from transformers.pytorch_utils import Conv1D

    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn, range_setting
    from fastforward_tpu.testing.hf_golden import (
        fabricate_gpt2_model,
        nnx_gpt2_from_hf,
        our_gpt2_config,
        ppl_jax,
        sample_eval_set,
    )

    torch_model, hf_cfg = fabricate_gpt2_model("tiny")
    config = our_gpt2_config(hf_cfg)
    model = nnx_gpt2_from_hf(torch_model, config)

    eval_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 4, 32, seed=1)
    calib_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 4, 32, seed=2)

    # fp32 control: the two implementations must already agree on ppl.
    ppl_ref_fp = _ref_ppl(ff_ref, torch, torch_model, eval_ids)
    ppl_our_fp = ppl_jax(lambda b: model(b), eval_ids)
    assert abs(ppl_our_fp - ppl_ref_fp) <= PPL_TOL, (
        f"fp32 ppl disagrees before quantization: "
        f"ours {ppl_our_fp:.4f} vs reference {ppl_ref_fp:.4f}"
    )

    # --- reference side: quantize the transformer-block Conv1D matmuls.
    # HF GPT-2 matmuls are Conv1D with (in, out) weights; the reference has
    # no built-in counterpart, so register one through the public
    # `extra_conversion` mechanism (mirrors the reference's own
    # QuantizedLlamaSDPAttention pattern in
    # `tests/_orchestration/test_gptq_end2end.py:152`).
    class QuantizedConv1D(ff_ref.nn.QuantizedModule, Conv1D):
        def __init_quantization__(self):
            super().__init_quantization__()
            self.input_quantizer = ff_ref.nn.QuantizerStub(input_quantizer=True)
            self.weight_quantizer = ff_ref.nn.QuantizerStub(
                weight_quantizer=True, shape=self.weight.shape
            )
            self.output_quantizer = ff_ref.nn.QuantizerStub(output_quantizer=True)

        def forward(self, x):
            def dq(t):
                return t.dequantize() if isinstance(
                    t, ff_ref.quantized_tensor.QuantizedTensor
                ) else t

            x = dq(self.input_quantizer(x))
            w = dq(self.weight_quantizer(self.weight))
            size_out = x.size()[:-1] + (self.nf,)
            out = torch.addmm(self.bias, x.view(-1, x.size(-1)), w)
            return dq(self.output_quantizer(out.view(size_out)))

    # Pass-through surrogates for the GPT-2 container modules (the
    # reference's documented prototyping path), plus the real QuantizedConv1D
    # for the matmuls.
    conversion = ff_ref.nn.quantized_module.surrogate_quantized_modules(
        torch_model, extra_conversion={Conv1D: QuantizedConv1D}
    )
    conversion[Conv1D] = QuantizedConv1D
    ff_ref.quantize_model(torch_model, extra_conversion=conversion)
    wq = ff_ref.find_quantizers(
        torch_model,
        "transformer/**/[cls:QuantizedConv1D]/[quantizer:parameter/weight]",
    )
    wq.initialize(
        ff_ref.nn.LinearQuantizer, num_bits=8, symmetric=True,
        granularity=ff_ref.PerChannel(1),
    )
    aq = ff_ref.find_quantizers(
        torch_model,
        "transformer/**/[cls:QuantizedConv1D]/[quantizer:activation/input]",
    )
    aq.initialize(ff_ref.nn.LinearQuantizer, num_bits=8, symmetric=False)
    _ref_running_minmax_calibrate(ff_ref, torch, torch_model, calib_ids)
    ppl_ref_q = _ref_ppl(ff_ref, torch, torch_model, eval_ids)

    # --- repo side: identical config on the simulation tier. The nnx GPT-2's
    # Linears are exactly the four block matmuls (tied lm head is a plain
    # matmul, matching the reference side's `transformer/**` scoping).
    ffnn.quantize_model(model)
    qconfig = ff.QuantizationConfig()
    qconfig.add_rule(
        "**/[cls:Linear]/[quantizer:parameter/weight]", ffnn.LinearQuantizer,
        num_bits=8, symmetric=True, granularity=ff.PerChannel(1),
    )
    qconfig.add_rule(
        "**/[cls:Linear]/[quantizer:activation/input]", ffnn.LinearQuantizer,
        num_bits=8, symmetric=False,
    )
    qconfig.initialize(model)
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(jnp.asarray(calib_ids))
        ppl_our_q = ppl_jax(lambda b: model(b), eval_ids)

    print(
        f"\nGPT-2 W8A8 ppl: ours {ppl_our_q:.4f} vs reference {ppl_ref_q:.4f} "
        f"(delta {abs(ppl_our_q - ppl_ref_q):.4f}; "
        f"fp32 {ppl_our_fp:.4f}/{ppl_ref_fp:.4f})"
    )
    assert abs(ppl_our_q - ppl_ref_q) <= PPL_TOL, (
        f"W8A8 ppl parity failed: ours {ppl_our_q:.4f} vs reference "
        f"{ppl_ref_q:.4f} (fp32: {ppl_our_fp:.4f}/{ppl_ref_fp:.4f})"
    )


def test_llama_w4_ppl_parity_vs_reference(ref, tmp_path):
    """Small-Llama W4 per-channel asymmetric weight-only (the reference GPTQ
    e2e test's quantizer config, `tests/_orchestration/
    test_gptq_end2end.py:138-160`): reference simulation vs repo simulation
    tier at identical config and weights. |delta ppl| <= 0.1.
    """
    ff_ref, torch = ref
    import fastforward_tpu as ff
    from fastforward_tpu import nn as ffnn, range_setting
    from fastforward_tpu.testing.hf_golden import (
        fabricate_hf_checkpoint,
        nnx_model_from_tensors,
        our_config,
        ppl_jax,
        sample_eval_set,
    )

    out_dir = str(tmp_path / "llama_ckpt")
    torch_model, hf_cfg = fabricate_hf_checkpoint(out_dir, "tiny")
    config = our_config(hf_cfg)
    tensors = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    model = nnx_model_from_tensors(tensors, config)

    eval_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 4, 48, seed=1)
    calib_ids = sample_eval_set(torch_model, hf_cfg.vocab_size, 2, 48, seed=2)

    ppl_ref_fp = _ref_ppl(ff_ref, torch, torch_model, eval_ids)
    ppl_our_fp = ppl_jax(lambda b: model(b)[0], eval_ids)
    assert abs(ppl_our_fp - ppl_ref_fp) <= PPL_TOL, (
        f"fp32 ppl disagrees: ours {ppl_our_fp:.4f} vs ref {ppl_ref_fp:.4f}"
    )

    # --- reference side: W4 asymmetric per-out-channel on decoder linears
    # (lm_head excluded on both sides). Containers get pass-through
    # surrogates (the reference's documented prototyping path).
    conversion = ff_ref.nn.quantized_module.surrogate_quantized_modules(torch_model)
    ff_ref.quantize_model(torch_model, extra_conversion=conversion)
    wq = ff_ref.find_quantizers(
        torch_model,
        "model/layers/**/[cls:ff_ref.nn.QuantizedLinear]/[quantizer:parameter/weight]",
    )
    wq.initialize(
        ff_ref.nn.LinearQuantizer, num_bits=4, symmetric=False,
        granularity=ff_ref.PerChannel(0),  # HF weight layout (out, in)
    )
    _ref_running_minmax_calibrate(ff_ref, torch, torch_model, calib_ids)
    ppl_ref_q = _ref_ppl(ff_ref, torch, torch_model, eval_ids)

    # --- repo side: same config; nnx kernels are (in, out) so the
    # out-channel axis is 1.
    ffnn.quantize_model(model)
    qconfig = ff.QuantizationConfig()
    qconfig.add_rule(
        "**/layers/**/[cls:Linear]/[quantizer:parameter/weight]",
        ffnn.LinearQuantizer, num_bits=4, symmetric=False,
        granularity=ff.PerChannel(1),
    )
    qconfig.initialize(model)
    with ff.strict_quantization(False):
        with range_setting.estimate_ranges(model, range_setting.running_minmax):
            model(jnp.asarray(calib_ids))
        ppl_our_q = ppl_jax(lambda b: model(b)[0], eval_ids)

    print(
        f"\nLlama W4 ppl: ours {ppl_our_q:.4f} vs reference {ppl_ref_q:.4f} "
        f"(delta {abs(ppl_our_q - ppl_ref_q):.4f}; "
        f"fp32 {ppl_our_fp:.4f}/{ppl_ref_fp:.4f})"
    )
    assert abs(ppl_our_q - ppl_ref_q) <= PPL_TOL, (
        f"W4 ppl parity failed: ours {ppl_our_q:.4f} vs reference "
        f"{ppl_ref_q:.4f} (fp32: {ppl_our_fp:.4f}/{ppl_ref_fp:.4f})"
    )
