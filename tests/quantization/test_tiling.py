"""Tile layout tests. Modeled on reference `tests/quantization/test_tiled_affine.py`."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastforward_tpu.quantization import tiling


def test_tiles_to_rows_identity_tile():
    # GIVEN data and a whole-tensor tile
    data = jnp.arange(24).reshape(2, 3, 4)
    # WHEN converting to rows with tile == data shape
    rows = tiling.tiles_to_rows(data, (2, 3, 4))
    # THEN a single row holds all elements in order
    np.testing.assert_array_equal(np.asarray(rows), np.arange(24)[None, :])


def test_tiles_to_rows_per_channel():
    # GIVEN a 2D tensor tiled per-row
    data = jnp.arange(12).reshape(3, 4)
    # WHEN tiling with (1, 4)
    rows = tiling.tiles_to_rows(data, (1, 4))
    # THEN each row of data becomes a tile row
    np.testing.assert_array_equal(np.asarray(rows), np.arange(12).reshape(3, 4))


def test_tiles_to_rows_blocks():
    # GIVEN a 4x4 tensor tiled into 2x2 blocks
    data = jnp.arange(16).reshape(4, 4)
    rows = tiling.tiles_to_rows(data, (2, 2))
    # THEN tiles are row-major over the grid, elements row-major within a tile
    expected = np.array([
        [0, 1, 4, 5],
        [2, 3, 6, 7],
        [8, 9, 12, 13],
        [10, 11, 14, 15],
    ])
    np.testing.assert_array_equal(np.asarray(rows), expected)


@pytest.mark.parametrize(
    "shape,tile",
    [
        ((4, 4), (2, 2)),
        ((2, 3, 4), (1, 3, 2)),
        ((6,), (3,)),
        ((2, 8), (2, 8)),
        ((8, 4, 2), (4, 1, 2)),
    ],
)
def test_rows_roundtrip(shape, tile):
    # GIVEN arbitrary data
    data = jnp.arange(int(np.prod(shape))).reshape(shape)
    # WHEN converting to rows and back
    rows = tiling.tiles_to_rows(data, tile)
    restored = tiling.rows_to_tiles(rows, shape, tile)
    # THEN the roundtrip is exact
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(data))
    assert rows.shape == (tiling.num_tiles(shape, tile), int(np.prod(tile)))


def test_check_tile_compatibility_rejects_nondividing():
    with pytest.raises(ValueError, match="divide"):
        tiling.check_tile_compatibility((4, 4), (3, 2))


def test_check_tile_compatibility_rejects_rank_mismatch():
    with pytest.raises(ValueError, match="dimensionality"):
        tiling.check_tile_compatibility((4, 4), (2,))


def test_param_view_broadcast_equals_row_math():
    # GIVEN per-tile params and data
    shape, tile = (4, 6), (2, 3)
    data = jnp.arange(24, dtype=jnp.float32).reshape(shape)
    n = tiling.num_tiles(shape, tile)
    params = jnp.arange(1, n + 1, dtype=jnp.float32)
    # WHEN scaling via the broadcast path and via the row path
    broadcast_result = tiling.apply_per_tile(
        lambda d, p: d * p, data, params, tile_size=tile
    )
    rows = tiling.tiles_to_rows(data, tile) * params[:, None]
    row_result = tiling.rows_to_tiles(rows, shape, tile)
    # THEN both paths agree (broadcast path never materializes rows)
    np.testing.assert_allclose(np.asarray(broadcast_result), np.asarray(row_result))


def test_empty_tensor():
    data = jnp.zeros((0, 4))
    rows = tiling.tiles_to_rows(data, (1, 4))
    assert rows.shape == (1, 0)
