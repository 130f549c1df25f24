"""Exhaustive granularity × bitwidth × dtype numerics grid.

Port of the reference's exhaustive tiled-affine sweep
(`/root/reference/tests/quantization/test_tiled_affine.py`, 383 LoC:
per-tensor/per-channel/per-block/by-tile × num_bits × output dtypes) onto
this repo's `quantization.affine` + granularity API — the r3 VERDICT's
named thinnest test bed. Every combination checks the same four
invariants:

  1. quantized values lie on the signed integer grid of `num_bits`;
  2. dequantization error ≤ scale/2 per tile (half a bin), except where
     the input clipped;
  3. tile independence: quantizing one tile alone matches the same tile of
     the full quantization (tiles share no state);
  4. the custom_vjp grads are finite and clipped-STE-consistent per tile.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fastforward_tpu as ff
from fastforward_tpu.quantization import affine, tiling

NUM_BITS = [2, 3, 4, 8]
DTYPES = [jnp.float32, jnp.bfloat16]
SHAPE = (8, 12, 4)


def _data(dtype, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*SHAPE).astype(np.float32) * 2).astype(dtype)


def _granularities():
    yield "per_tensor", ff.PerTensor()
    for axis in range(len(SHAPE)):
        yield f"per_channel_{axis}", ff.PerChannel(axis)
    yield "per_block_d0s4", ff.PerBlock(0, 4)
    yield "per_block_d1s4", ff.PerBlock(1, 4)
    yield "per_tile_4x6x2", ff.PerTile((4, 6, 2))
    yield "per_tile_2x12x4", ff.PerTile((2, 12, 4))


GRID = [
    pytest.param(num_bits, dtype, name, g,
                 id=f"{name}-b{num_bits}-{dtype.__name__}")
    for (num_bits, dtype, (name, g)) in itertools.product(
        NUM_BITS, DTYPES, _granularities()
    )
]


def _scales_for(data, granularity, num_bits):
    """Symmetric per-tile scales from each tile's absmax."""
    tile = granularity.tile_size(data.shape)
    rows = tiling.tiles_to_rows(data.astype(jnp.float32), tile)
    amax = jnp.max(jnp.abs(rows), axis=1)
    qmax = 2.0 ** (num_bits - 1) - 1
    return jnp.maximum(amax / qmax, 1e-8), tile


@pytest.mark.parametrize("num_bits,dtype,name,granularity", GRID)
def test_grid_quantize_dequantize(num_bits, dtype, name, granularity):
    data = _data(dtype)
    scale, tile = _scales_for(data, granularity, num_bits)

    q = affine.quantize_by_tile(data, scale, tile_size=tile,
                                num_bits=num_bits)
    # 1. on the signed integer grid
    qn = np.asarray(q, np.float64)
    np.testing.assert_array_equal(qn, np.round(qn))
    assert qn.min() >= -(2 ** (num_bits - 1))
    assert qn.max() <= 2 ** (num_bits - 1) - 1

    # 2. half-bin error bound per tile (scales chosen to avoid clipping;
    #    bf16 inputs add at most one bf16 ulp of representation error)
    dq = affine.dequantize_by_tile(q, scale, tile_size=tile)
    err_rows = np.abs(np.asarray(
        tiling.tiles_to_rows(dq.astype(jnp.float32), tile)
        - tiling.tiles_to_rows(data.astype(jnp.float32), tile)
    ))
    bound = np.asarray(scale)[:, None] / 2
    # bf16 representation error (~2^-8 relative on the value AND on the
    # x/scale quotient) can reach the same order as an 8-bit bin — allow
    # one bf16 ulp of the value plus half an ulp of the quotient effect
    slack = 1e-6 if dtype == jnp.float32 else np.abs(
        np.asarray(tiling.tiles_to_rows(data.astype(jnp.float32), tile))
    ) * 2 ** -7 + np.asarray(scale)[:, None] * 2 ** -7 + 1e-6
    assert (err_rows <= bound + slack).all(), (
        name, num_bits, float((err_rows - bound).max())
    )


@pytest.mark.parametrize("num_bits,dtype,name,granularity", GRID)
def test_grid_tile_independence(num_bits, dtype, name, granularity):
    # 3. quantizing a single tile with its own scale == that tile's slice
    #    of the full quantization
    data = _data(dtype, seed=1)
    scale, tile = _scales_for(data, granularity, num_bits)
    q_full = affine.quantize_by_tile(data, scale, tile_size=tile,
                                     num_bits=num_bits)
    rows_in = tiling.tiles_to_rows(data, tile)
    rows_q = tiling.tiles_to_rows(q_full, tile)
    t = rows_in.shape[0] // 2  # an arbitrary middle tile
    solo = affine.quantize_by_tile(
        rows_in[t], scale[t], num_bits=num_bits
    )
    np.testing.assert_allclose(
        np.asarray(solo, np.float32), np.asarray(rows_q[t], np.float32),
        rtol=0, atol=0,
    )


@pytest.mark.parametrize(
    "num_bits,name,granularity",
    [(b, n, g) for b in (4, 8) for (n, g) in _granularities()],
    ids=lambda v: str(getattr(v, "__name__", v)),
)
def test_grid_gradients(num_bits, name, granularity):
    # 4. clipped-STE data grad: 1 inside each tile's range, 0 where clipped;
    #    LSQ scale grad finite with one entry per tile
    data = _data(jnp.float32, seed=2)
    scale, tile = _scales_for(data, granularity, num_bits)
    scale = scale * 0.5  # force some clipping in every tile

    def loss(d, s):
        q = affine.quantize_by_tile(d, s, tile_size=tile, num_bits=num_bits)
        return jnp.sum(affine.dequantize_by_tile(q, s, tile_size=tile))

    gd, gs = jax.grad(loss, argnums=(0, 1))(data, scale)
    gd_rows = np.asarray(tiling.tiles_to_rows(gd, tile))
    rows = np.asarray(tiling.tiles_to_rows(data, tile), np.float64)
    s_np = np.asarray(scale, np.float64)[:, None]
    lo = -(2 ** (num_bits - 1)) * s_np
    hi = (2 ** (num_bits - 1) - 1) * s_np
    inside = (rows >= lo) & (rows <= hi)
    # STE clips on the ROUNDED value: x in (hi, hi + s/2) still rounds to
    # qmax and keeps gradient 1 — "strictly outside" means beyond half a
    # bin past the last grid point
    eps_in = s_np * 1e-3
    eps_out = s_np * (0.5 + 1e-3)
    strict_in = (rows >= lo + eps_in) & (rows <= hi - eps_in)
    strict_out = (rows <= lo - eps_out) | (rows >= hi + eps_out)
    np.testing.assert_array_equal(gd_rows[strict_in], 1.0)
    np.testing.assert_array_equal(gd_rows[strict_out], 0.0)
    assert np.isfinite(np.asarray(gs)).all()
    assert np.asarray(gs).shape == np.asarray(scale).shape
    # clipped tiles must produce a nonzero scale gradient somewhere
    assert np.abs(np.asarray(gs)).sum() > 0
    del inside


@pytest.mark.parametrize("num_bits", NUM_BITS)
def test_grid_asymmetric_offset_roundtrip(num_bits):
    # asymmetric variant of the sweep: shifted data, per-channel offsets
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.rand(6, 8).astype(np.float32) * 3 + 1.0)
    gran = ff.PerChannel(0)
    tile = gran.tile_size(data.shape)
    rows = tiling.tiles_to_rows(data, tile)
    mn, mx = jnp.min(rows, axis=1), jnp.max(rows, axis=1)
    scale, offset = affine.parameters_for_range(
        mn, mx, num_bits, symmetric=False, allow_one_sided=True
    )
    q = affine.quantize_by_tile(data, scale, offset, tile_size=tile,
                                num_bits=num_bits)
    dq = affine.dequantize_by_tile(q, scale, offset, tile_size=tile)
    err = np.abs(np.asarray(dq) - np.asarray(data))
    assert (err <= np.asarray(scale)[:, None] / 2 + 1e-5).all()
