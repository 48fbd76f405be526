"""Tile binning: triangle -> screen-tile pair lists, sorted by tile.

The TPU has no hardware rasterizer and hates scatter, so binning is built
from three primitives XLA compiles well: ``jnp.repeat`` with a static total
(expansion), ``lax.sort_key_val`` (grouping), and ``searchsorted`` (range
extraction). The raster kernel then walks each tile's contiguous slice of
the sorted pair list.

Tiles are TILE_H x TILE_W pixels; the default 32x128 matches the VPU lane
layout (8x128 registers, 4 sublane blocks per tile) so per-tile edge
evaluation is perfectly vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import TriangleSetup

TILE_H = 32
TILE_W = 128


class Bins(NamedTuple):
    order: jax.Array  # (P,) i32 — pair index into the setup arrays, tile-sorted
    tile_of_pair: jax.Array  # (P,) i32 — tile id per sorted pair (sentinel ntiles)
    tile_start: jax.Array  # (ntiles,) i32
    tile_count: jax.Array  # (ntiles,) i32
    num_pairs: jax.Array  # () i32 — total real pairs (may exceed P if overflowed)


def bin_triangles(
    tri: TriangleSetup, width: int, height: int, p_cap: int,
    tile_h: int = TILE_H, tile_w: int = TILE_W,
    y_offset=0,
) -> Bins:
    """Bin triangles into the band [y_offset, y_offset + height).

    y_offset may be a traced scalar (band rendering under shard_map); the
    tile grid covers `height` rows starting at that global pixel row.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    ntiles = ntx * nty

    # Clamp the global-pixel bbox into band-local coordinates.
    by0_px = jnp.clip(tri.bbox[:, 1] - y_offset, 0, height - 1)
    by1_px = jnp.clip(tri.bbox[:, 3] - y_offset, 0, height - 1)
    in_band = (tri.bbox[:, 3] >= y_offset) & (tri.bbox[:, 1] < y_offset + height)

    bx0 = tri.bbox[:, 0] // tile_w
    by0 = by0_px // tile_h
    bx1 = tri.bbox[:, 2] // tile_w
    by1 = by1_px // tile_h
    tw = bx1 - bx0 + 1
    th = by1 - by0 + 1
    counts = jnp.where(tri.valid & in_band, tw * th, 0)

    offsets = jnp.cumsum(counts) - counts
    total = counts.sum()

    t = tri.setup.shape[0]
    pair_tri = jnp.repeat(
        jnp.arange(t, dtype=jnp.int32), counts, total_repeat_length=p_cap
    )
    pos = jnp.arange(p_cap, dtype=jnp.int32)
    pair_ok = pos < total
    pair_tri = jnp.where(pair_ok, pair_tri, 0)
    local = pos - offsets[pair_tri]
    w = tw[pair_tri]
    tile_x = bx0[pair_tri] + local % w
    tile_y = by0[pair_tri] + local // w
    tile_id = jnp.where(pair_ok, tile_y * ntx + tile_x, ntiles)

    tile_sorted, order = jax.lax.sort_key_val(tile_id, pair_tri)

    tile_range = jnp.arange(ntiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(
        jnp.int32
    )
    return Bins(
        order=order,
        tile_of_pair=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=total.astype(jnp.int32),
    )


def gather_sorted_setup(tri: TriangleSetup, bins: Bins) -> jax.Array:
    """Materialize the tile-sorted (P, 16) setup rows so the raster kernel
    reads contiguous DMA slices instead of doing per-triangle gathers."""
    return tri.setup[bins.order]
