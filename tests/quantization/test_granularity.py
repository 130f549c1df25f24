"""Granularity tests. Modeled on reference granularity semantics
(`src/fastforward/quantization/granularity.py`)."""

import pytest

from fastforward_tpu.quantization import granularity as g


def test_per_tensor_tile_size():
    assert g.PerTensor().tile_size((2, 4, 6)) == "data_shape"
    assert g.PerTensor().parameter_dimensionality((2, 4, 6)) == 1


def test_per_channel_tile_size():
    assert g.PerChannel(0).tile_size((2, 4, 6)) == (1, 4, 6)
    assert g.PerChannel((0, 2)).tile_size((2, 4, 6)) == (1, 4, 1)
    assert g.PerChannel(1).parameter_dimensionality((2, 4, 6)) == 4


def test_per_block_tile_size():
    gran = g.PerBlock(block_dims=1, block_sizes=2, per_channel_dims=0)
    assert gran.tile_size((4, 8)) == (1, 2)
    assert gran.parameter_dimensionality((4, 8)) == 16


def test_per_block_strict_rejects_nondividing():
    gran = g.PerBlock(block_dims=1, block_sizes=3)
    with pytest.raises(ValueError, match="strict_blocks"):
        gran.tile_size((4, 8))


def test_per_block_rejects_oversized_block():
    gran = g.PerBlock(block_dims=1, block_sizes=16)
    with pytest.raises(ValueError, match="block"):
        gran.tile_size((4, 8))


def test_per_block_length_mismatch():
    with pytest.raises(ValueError, match="equal length"):
        g.PerBlock(block_dims=(0, 1), block_sizes=(2,))


def test_per_tile():
    gran = g.PerTile((2, 4))
    assert gran.tile_size((4, 8)) == (2, 4)
    with pytest.raises(ValueError):
        gran.tile_size((5, 8))


def test_equality_and_hash():
    assert g.PerChannel(0) == g.PerChannel(0)
    assert g.PerChannel(0) != g.PerChannel(1)
    assert g.PerTensor() == g.PerTensor()
    assert g.PerTensor() != g.PerChannel(0)
    assert hash(g.PerTile((2, 2))) == hash(g.PerTile((2, 2)))
    assert g.PerBlock(1, 2) == g.PerBlock(1, 2)


@pytest.mark.parametrize(
    "data_size,tile_size,expected_type",
    [
        ((4, 8), (4, 8), g.PerTensor),
        ((4, 8), (1, 8), g.PerChannel),
        ((4, 8), (1, 2), g.PerBlock),
        ((4, 8), (2, 8), g.PerBlock),
    ],
)
def test_granularity_from_sizes(data_size, tile_size, expected_type):
    # GIVEN a data/tile pair WHEN inferring granularity
    gran = g.granularity_from_sizes(data_size, tile_size)
    # THEN the simplest representation is returned and it round-trips
    assert isinstance(gran, expected_type)
    resolved = gran.tile_size(data_size)
    resolved = data_size if resolved == "data_shape" else resolved
    assert tuple(resolved) == tuple(tile_size)
