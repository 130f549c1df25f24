"""Tile layout utilities.

The reference materializes a "row form" — reshape + permute so every tile
becomes one row (`src/fastforward/quantization/tiled_tensor.py:71-144`) — and
runs quantization math on (num_tiles, tile_elems) matrices. On TPU a transpose
is a real relayout, so the hot path here avoids it: quantization math runs on
the *interleaved grid view* ``(g0, t0, g1, t1, ...)`` with parameters reshaped
to ``(g0, 1, g1, 1, ...)`` and broadcast — pure reshapes that XLA folds into
the surrounding elementwise ops for free.

``tiles_to_rows`` / ``rows_to_tiles`` are still provided for API parity and
for algorithms (GPTQ, range estimators) that genuinely want per-tile rows.

Tile-size convention (same as the reference): ``tile_size`` has the same rank
as the data, every entry divides the corresponding data dim, and one
(scale, offset) pair is shared per tile. Tiles are ordered row-major over the
grid ``g_i = data_shape[i] // tile_size[i]``; parameters are flat arrays of
length ``prod(g)`` in that order.
"""

from typing import Literal, Sequence

import jax

Shape = tuple[int, ...]
TileOrShape = Sequence[int] | Literal["data_shape"]


def check_tile_compatibility(input_size: Sequence[int], tile_size: Sequence[int]) -> None:
    """Raise ValueError unless every tile dim divides the matching data dim.

    Parity: reference `tiled_tensor.py:19-42`.
    """
    if len(input_size) != len(tile_size):
        raise ValueError(
            "Input dimensionality must match tile_size dimensionality, got "
            f"{len(input_size)} and {len(tile_size)}"
        )
    mismatched = [
        i
        for i, (d, t) in enumerate(zip(input_size, tile_size))
        if t > 0 and d % t != 0
    ]
    if mismatched:
        errors = [f"{input_size[i]} and {tile_size[i]} for dimension {i}" for i in mismatched]
        raise ValueError(
            "Each dimension of tile_size must divide the corresponding input dimension. Got "
            + ", ".join(errors)
            + "."
        )


def resolve_tile_size(tile_size: TileOrShape, data_shape: Sequence[int]) -> Shape:
    """Resolve the ``"data_shape"`` sentinel and validate compatibility."""
    if tile_size == "data_shape":
        return tuple(data_shape)
    tile = tuple(int(t) for t in tile_size)
    check_tile_compatibility(tuple(data_shape), tile)
    return tile


def num_tiles(data_shape: Sequence[int], tile_size: TileOrShape) -> int:
    """Number of tiles (== number of parameter elements)."""
    tile = resolve_tile_size(tile_size, data_shape)
    n = 1
    for d, t in zip(data_shape, tile):
        n *= d // t
    return n


def tile_grid(data_shape: Sequence[int], tile_size: TileOrShape) -> Shape:
    """Per-dimension tile counts ``g_i = data_shape[i] // tile_size[i]``."""
    tile = resolve_tile_size(tile_size, data_shape)
    return tuple(d // t for d, t in zip(data_shape, tile))


def interleaved_shape(data_shape: Sequence[int], tile_size: TileOrShape) -> Shape:
    """The grid/tile interleaved view shape ``(g0, t0, g1, t1, ...)``."""
    tile = resolve_tile_size(tile_size, data_shape)
    out: list[int] = []
    for d, t in zip(data_shape, tile):
        out.append(d // t)
        out.append(t)
    return tuple(out)


def tile_view(data: jax.Array, tile_size: TileOrShape) -> jax.Array:
    """Reshape ``data`` into the interleaved grid/tile view (no transpose)."""
    return data.reshape(interleaved_shape(data.shape, tile_size))


def param_view(param: jax.Array, data_shape: Sequence[int], tile_size: TileOrShape) -> jax.Array:
    """Reshape a flat per-tile parameter array so it broadcasts against
    ``tile_view(data)``: grid dims in place, tile dims as 1.
    """
    grid = tile_grid(data_shape, tile_size)
    shape: list[int] = []
    for g in grid:
        shape.append(g)
        shape.append(1)
    return param.reshape(shape)


def apply_per_tile(fn, data: jax.Array, *params: jax.Array, tile_size: TileOrShape) -> jax.Array:
    """Apply ``fn(tiled_data, *broadcast_params)`` in the interleaved view and
    reshape the result back to ``data.shape``. The broadcast-with-reshaped-
    params formulation keeps everything a fusible elementwise op on TPU.
    """
    tiled = tile_view(data, tile_size)
    expanded = tuple(param_view(p, data.shape, tile_size) for p in params)
    return fn(tiled, *expanded).reshape(data.shape)


def _row_permutation(ndim2: int) -> list[int]:
    # Grid dims (even positions) first, then tile dims (odd positions).
    return list(range(0, ndim2, 2)) + list(range(1, ndim2, 2))


def tiles_to_rows(data: jax.Array, tile_size: TileOrShape) -> jax.Array:
    """Reshape + permute ``data`` so each tile becomes one row.

    Output shape: ``(num_tiles, tile_elems)``, tiles ordered row-major over
    the grid. Parity: reference `tiled_tensor.py:71-98`.
    """
    if data.size == 0:
        return data.reshape(1, 0)
    tile = resolve_tile_size(tile_size, data.shape)
    tiled = tile_view(data, tile)
    perm = _row_permutation(tiled.ndim)
    n = num_tiles(data.shape, tile)
    return tiled.transpose(perm).reshape(n, -1)


def rows_to_tiles(
    tiled_data: jax.Array, data_size: Sequence[int], tile_size: TileOrShape
) -> jax.Array:
    """Inverse of :func:`tiles_to_rows`.

    Parity: reference `tiled_tensor.py:101-144`.
    """
    data_size = tuple(data_size)
    if tiled_data.size == 0:
        return tiled_data.reshape(data_size)
    tile = resolve_tile_size(tile_size, data_size)

    tile_elems = 1
    for t in tile:
        tile_elems *= t
    expected_rows = num_tiles(data_size, tile)
    expected = (expected_rows, tile_elems)
    if tuple(tiled_data.shape) != expected:
        raise ValueError(
            f"tiled_data is expected to be of size {expected} but found {tuple(tiled_data.shape)}"
        )

    inter = interleaved_shape(data_size, tile)
    ndim2 = len(inter)
    perm = _row_permutation(ndim2)
    permuted_shape = [inter[i] for i in perm]
    # Invert the permutation used by tiles_to_rows.
    inverse = [0] * ndim2
    for out_pos, in_pos in enumerate(perm):
        inverse[in_pos] = out_pos
    return tiled_data.reshape(permuted_shape).transpose(inverse).reshape(data_size)
