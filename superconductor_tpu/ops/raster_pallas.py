"""Pallas TPU tile rasterizer — the production visibility pass.

Replaces the GPU's hardware rasterizer + depth test (the draw_indexed calls
in src/systems/rendering.rs:611-704). Design:

  * The grid is (tiles_y, tiles_x); Mosaic runs grid steps sequentially on
    the core, so per-tile triangle counts may vary freely — total work is
    sum(count_t), no load-balancing problem.
  * Each tile's triangle list is a contiguous slice of the tile-sorted
    setup array (built by ops/binning.py). Setup rows are 16 f32 each;
    eight rows are packed per 128-lane HBM row so chunk DMAs are lane-
    aligned (Mosaic requires 128-aligned slices). The kernel double-
    buffer-DMAs chunks HBM -> SMEM and walks them with a dynamic-bound
    scalar loop (SMEM because per-triangle coefficients are consumed as
    scalars broadcast into vector ops).
  * Per triangle, edge/z/w planes are evaluated over the whole (TILE_H,
    TILE_W) pixel block in one shot on the VPU — the tile shape (32, 128)
    is exactly 4 native (8, 128) vregs, so every op is full-width.
  * The z-buffer and winning pair id live in VMEM for the whole tile;
    HBM sees exactly one write per pixel per pass. Barycentrics are not
    stored — the deferred stage recomputes them from the winner's setup
    row (see raster_ref docstring).

The kernel records the winner's *sorted position*; the caller converts back
to original pair ids with one XLA gather (cheaper than a second in-kernel
DMA stream of the order array).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import Bins
from .raster_ref import VisibilityBuffer

CHUNK = 256  # triangles per DMA chunk (multiple of 8)
ROWS_PER_CHUNK = CHUNK // 8  # packed 128-wide HBM rows per chunk


def _union_vma(*arrays):
    """Union of the inputs' varying-manual-axes. Under
    shard_map(check_vma=True) pallas_call does not infer its out_shape
    vma (jax 0.9 requires it explicitly on ShapeDtypeStruct); the outputs
    vary over exactly the axes any input varies over. Outside shard_map
    every input's vma is empty and this is a no-op."""
    vma = frozenset()
    for a in jax.tree_util.tree_leaves(arrays):
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    return vma


def _scalar_tie(a, b):
    """Scalar edge tie-break as f32 (see raster_ref._tie): 1.0 = accept
    e == 0 (edge coefficients (a, b) lexicographically positive)."""
    return jnp.where((a > 0.0) | ((a == 0.0) & (b > 0.0)), 1.0, 0.0)


def _edge_ok(e, tie_f):
    """Vector half-plane test with the fill rule: e > 0, or e == 0 when the
    scalar tie bit is set. Formulated with f32 selects only — Mosaic cannot
    legalize arith.select on i1 vectors."""
    return (e >= 0.0) & (jnp.where(e == 0.0, tie_f, 1.0) > 0.5)


def pack_setup_rows(sorted_setup: jax.Array) -> jax.Array:
    """(P, 16) -> (ceil(P/8) + ROWS_PER_CHUNK + 1, 128) lane-aligned pack."""
    p = sorted_setup.shape[0]
    pad_tris = (-p) % 8
    padded = jnp.pad(sorted_setup, ((0, pad_tris), (0, 0)))
    packed = padded.reshape(-1, 128)
    # extra rows so any chunk DMA (with +1 row for unaligned starts) is safe
    return jnp.pad(packed, ((0, ROWS_PER_CHUNK + 1), (0, 0)))


def _raster_kernel(
    tile_start_ref,  # (ntiles,) SMEM
    tile_count_ref,  # (ntiles,) SMEM
    y_off_ref,  # (1,) SMEM — global pixel row of this band's first row
    *refs,  # [depth_in, pair_in,] setup_hbm, outs, scratch
    tile_h: int,
    tile_w: int,
    ntx: int,
    reverse_z: bool,
    has_init: bool,
):
    if has_init:
        (depth_in, pair_in, setup_hbm,
         depth_out, pair_out, setup_smem, dma_sem) = refs
    else:
        (setup_hbm, depth_out, pair_out, setup_smem, dma_sem) = refs
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * ntx + tx
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    offset = jax.lax.rem(start, 8)
    start_row = jax.lax.div(start, 8)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
        jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
        jnp.float32
    )
    px = col + (tx * tile_w).astype(jnp.float32) + 0.5
    py = row + (ty * tile_h + y_off_ref[0]).astype(jnp.float32) + 0.5

    if has_init:
        depth = depth_in[:, :]
        pair = pair_in[:, :]
    else:
        far = 0.0 if reverse_z else 1.0
        depth = jnp.full((tile_h, tile_w), far, jnp.float32)
        pair = jnp.full((tile_h, tile_w), -1, jnp.int32)

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            setup_hbm.at[
                pl.ds(start_row + chunk_idx * ROWS_PER_CHUNK, ROWS_PER_CHUNK + 1), :
            ],
            setup_smem.at[slot],
            dma_sem.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _start_first():
        get_dma(0, 0).start()

    def chunk_body(c, carry):
        depth, pair = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _prefetch_next():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        rem = count - c * CHUNK

        def tri_body(r, carry):
            depth, pair = carry
            idx = r + offset
            srow = jax.lax.div(idx, 8)
            scol = jax.lax.rem(idx, 8) * 16

            def s(k):
                return setup_smem[slot, srow, scol + k]

            e0 = s(0) * px + s(1) * py + s(2)
            e1 = s(3) * px + s(4) * py + s(5)
            e2 = s(6) * px + s(7) * py + s(8)
            # Fill rule (see raster_ref._tie). The tie bit is a scalar f32
            # select per edge; the vector side stays f32 selects + compares
            # (Mosaic cannot legalize arith.select on i1 vectors).
            inside = (
                _edge_ok(e0, _scalar_tie(s(0), s(1)))
                & _edge_ok(e1, _scalar_tie(s(3), s(4)))
                & _edge_ok(e2, _scalar_tie(s(6), s(7)))
            )
            zsum = e0 * s(9) + e1 * s(10) + e2 * s(11)
            wsum = e0 * s(12) + e1 * s(13) + e2 * s(14)
            inside = inside & (wsum > 0.0)
            z = zsum / jnp.where(wsum == 0.0, 1.0, wsum)
            inside = inside & (z >= 0.0) & (z <= 1.0)
            if reverse_z:
                win = inside & (z > depth)
            else:
                win = inside & (z < depth)
            sorted_pos = start + c * CHUNK + r
            new_depth = jnp.where(win, z, depth)
            new_pair = jnp.where(win, sorted_pos, pair)
            return new_depth, new_pair

        n = jnp.minimum(rem, CHUNK)
        return jax.lax.fori_loop(0, n, tri_body, (depth, pair))

    depth, pair = jax.lax.fori_loop(0, num_chunks, chunk_body, (depth, pair))

    depth_out[:, :] = depth
    pair_out[:, :] = pair


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "reverse_z", "interpret"),
)
def rasterize_pallas_sorted(
    sorted_setup: jax.Array,  # (P, 16) tile-sorted setup rows
    tile_start: jax.Array,  # (ntiles,) i32
    tile_count: jax.Array,  # (ntiles,) i32
    height: int,
    width: int,
    tile_h: int = 32,
    tile_w: int = 128,
    reverse_z: bool = True,
    init: VisibilityBuffer | None = None,
    interpret: bool = False,
    y_offset=0,
) -> VisibilityBuffer:
    """Returns a VisibilityBuffer whose .pair holds SORTED positions.
    y_offset (may be traced) is the band's first global pixel row."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    pad_h = nty * tile_h
    pad_w = ntx * tile_w

    has_init = init is not None
    inputs = [
        tile_start.astype(jnp.int32),
        tile_count.astype(jnp.int32),
        jnp.asarray(y_offset, jnp.int32).reshape(1),
    ]
    blocked = pl.BlockSpec(
        (tile_h, tile_w), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM
    )
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem_full, smem_full, smem_full]
    if has_init:

        def padto(a, fill):
            return jnp.pad(
                a,
                ((0, pad_h - a.shape[0]), (0, pad_w - a.shape[1])),
                constant_values=fill,
            )

        inputs += [
            padto(init.depth, 0.0 if reverse_z else 1.0),
            padto(init.pair, -1),
        ]
        in_specs += [blocked, blocked]

    packed = pack_setup_rows(sorted_setup)
    inputs.append(packed)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))

    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        ntx=ntx,
        reverse_z=reverse_z,
        has_init=has_init,
    )

    vma = _union_vma(inputs)
    depth, pair = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=in_specs,
        out_specs=(blocked, blocked),
        out_shape=(
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32, vma=vma),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, ROWS_PER_CHUNK + 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*inputs)
    return VisibilityBuffer(
        depth=depth[:height, :width],
        pair=pair[:height, :width],
    )


def rasterize_pallas(
    sorted_setup: jax.Array,
    bins: Bins,
    height: int,
    width: int,
    reverse_z: bool = True,
    init: VisibilityBuffer | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    interpret: bool | None = None,
    y_offset=0,
) -> VisibilityBuffer:
    """Rasterize binned triangles; remaps winners to original pair ids."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    vis = rasterize_pallas_sorted(
        sorted_setup,
        bins.tile_start,
        bins.tile_count,
        height,
        width,
        tile_h=tile_h,
        tile_w=tile_w,
        reverse_z=reverse_z,
        init=init,
        interpret=interpret,
        y_offset=y_offset,
    )
    # sorted position -> original pair id (misses stay -1)
    hit = vis.pair >= 0
    pair = jnp.where(hit, bins.order[jnp.maximum(vis.pair, 0)], -1)
    return vis._replace(pair=pair)


# ---------------------------------------------------------------------------
# K-layer (k-buffer) kernel for alpha-clip / alpha-blend passes
# ---------------------------------------------------------------------------


def _kbuffer_kernel(
    tile_start_ref,
    tile_count_ref,
    y_off_ref,
    floor_in,  # (tile_h, tile_w) opaque depth floor
    setup_hbm,
    *refs,  # [depth_out,] pair_out, layers_out, scratch...
    k: int,
    tile_h: int,
    tile_w: int,
    ntx: int,
    reverse_z: bool,
    want_depth: bool,
):
    # Sorting always needs per-layer depth in VMEM scratch, but the HBM
    # depth planes are written only when a consumer exists (the clip pass
    # resolves a winning depth; the blend/particle passes read only .pair)
    # — K x 4 bytes/px of write traffic skipped per pass when not.
    if want_depth:
        (depth_out, pair_out, layers_out,
         depth_s, pair_s, layers_s, setup_smem, dma_sem) = refs
    else:
        (pair_out, layers_out,
         depth_s, pair_s, layers_s, setup_smem, dma_sem) = refs
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * ntx + tx
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    offset = jax.lax.rem(start, 8)
    start_row = jax.lax.div(start, 8)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px = col + (tx * tile_w).astype(jnp.float32) + 0.5
    py = row + (ty * tile_h + y_off_ref[0]).astype(jnp.float32) + 0.5

    far = 0.0 if reverse_z else 1.0
    for i in range(k):
        depth_s[i] = jnp.full((tile_h, tile_w), far, jnp.float32)
        pair_s[i] = jnp.full((tile_h, tile_w), -1, jnp.int32)
    layers_s[:, :] = jnp.zeros((tile_h, tile_w), jnp.int32)

    floor = floor_in[:, :]
    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            setup_hbm.at[
                pl.ds(start_row + chunk_idx * ROWS_PER_CHUNK, ROWS_PER_CHUNK + 1), :
            ],
            setup_smem.at[slot],
            dma_sem.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _start_first():
        get_dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _prefetch_next():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        rem = count - c * CHUNK

        def tri_body(r, _):
            idx = r + offset
            srow = jax.lax.div(idx, 8)
            scol = jax.lax.rem(idx, 8) * 16

            def s(kk):
                return setup_smem[slot, srow, scol + kk]

            e0 = s(0) * px + s(1) * py + s(2)
            e1 = s(3) * px + s(4) * py + s(5)
            e2 = s(6) * px + s(7) * py + s(8)
            # Fill rule (see raster_ref._tie): without it a pixel on two
            # adjacent transparent triangles' shared edge blends twice.
            inside = (
                _edge_ok(e0, _scalar_tie(s(0), s(1)))
                & _edge_ok(e1, _scalar_tie(s(3), s(4)))
                & _edge_ok(e2, _scalar_tie(s(6), s(7)))
            )
            zsum = e0 * s(9) + e1 * s(10) + e2 * s(11)
            wsum = e0 * s(12) + e1 * s(13) + e2 * s(14)
            inside = inside & (wsum > 0.0)
            z = zsum / jnp.where(wsum == 0.0, 1.0, wsum)
            inside = inside & (z >= 0.0) & (z <= 1.0)
            if reverse_z:
                accept = inside & (z > floor)
            else:
                accept = inside & (z < floor)
            sorted_pos = start + c * CHUNK + r
            layers_s[:, :] = layers_s[:, :] + accept.astype(jnp.int32)

            # Sorted insert (slot 0 = nearest). rank = #slots nearer.
            old_d = [depth_s[i] for i in range(k)]
            old_p = [pair_s[i] for i in range(k)]
            if reverse_z:
                nearer = [(od > z) & (op >= 0) for od, op in zip(old_d, old_p)]
            else:
                nearer = [(od < z) & (op >= 0) for od, op in zip(old_d, old_p)]
            rank = jnp.zeros((tile_h, tile_w), jnp.int32)
            for n in nearer:
                rank = rank + n.astype(jnp.int32)
            rank = jnp.where(accept, rank, k)
            for i in range(k - 1, -1, -1):
                is_new = rank == i
                shifted = rank < i
                prev = max(i - 1, 0)
                depth_s[i] = jnp.where(
                    is_new, z, jnp.where(shifted, old_d[prev], old_d[i])
                )
                pair_s[i] = jnp.where(
                    is_new, sorted_pos, jnp.where(shifted, old_p[prev], old_p[i])
                )
            return 0

        n = jnp.minimum(rem, CHUNK)
        jax.lax.fori_loop(0, n, tri_body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    for i in range(k):
        if want_depth:
            depth_out[i] = depth_s[i]
        pair_out[i] = pair_s[i]
    layers_out[:, :] = layers_s[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "k", "tile_h", "tile_w", "reverse_z",
        "interpret", "want_depth",
    ),
)
def kbuffer_pallas_sorted(
    sorted_setup: jax.Array,
    tile_start: jax.Array,
    tile_count: jax.Array,
    height: int,
    width: int,
    k: int = 4,
    tile_h: int = 32,
    tile_w: int = 128,
    reverse_z: bool = True,
    depth_floor: jax.Array | None = None,
    interpret: bool = False,
    y_offset=0,
    want_depth: bool = True,
):
    """K-layer raster -> (KBuffer with SORTED positions in .pair,
    layers (H, W) i32 accepted-fragment count, which may exceed k — the
    caller's signal to grow blend_layers rather than drop surfaces).
    want_depth=False skips the HBM depth-plane outputs (KBuffer.depth is
    None) for consumers that only read .pair (blend/particle shading)."""
    from .raster_kbuffer import KBuffer

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    pad_h = nty * tile_h
    pad_w = ntx * tile_w

    far = 0.0 if reverse_z else 1.0
    if depth_floor is None:
        floor0 = jnp.full((pad_h, pad_w), far, jnp.float32)
    else:
        floor0 = jnp.pad(
            depth_floor,
            ((0, pad_h - depth_floor.shape[0]), (0, pad_w - depth_floor.shape[1])),
            constant_values=far,
        )

    packed = pack_setup_rows(sorted_setup)
    kernel = functools.partial(
        _kbuffer_kernel,
        k=k,
        tile_h=tile_h,
        tile_w=tile_w,
        ntx=ntx,
        reverse_z=reverse_z,
        want_depth=want_depth,
    )
    blocked = pl.BlockSpec(
        (tile_h, tile_w), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM
    )
    blocked_k = pl.BlockSpec(
        (k, tile_h, tile_w), lambda ty, tx: (0, ty, tx), memory_space=pltpu.VMEM
    )
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_specs = (blocked_k, blocked) if not want_depth else (
        blocked_k, blocked_k, blocked
    )
    vma = _union_vma(tile_start, tile_count, y_offset, floor0, packed)
    out_shape = (
        jax.ShapeDtypeStruct((k, pad_h, pad_w), jnp.int32, vma=vma),
        jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32, vma=vma),
    )
    if want_depth:
        out_shape = (
            jax.ShapeDtypeStruct((k, pad_h, pad_w), jnp.float32, vma=vma),
        ) + out_shape
    outs = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=[
            smem_full,
            smem_full,
            smem_full,
            blocked,  # floor
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((k, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((k, tile_h, tile_w), jnp.int32),
            pltpu.VMEM((tile_h, tile_w), jnp.int32),
            pltpu.SMEM((2, ROWS_PER_CHUNK + 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        tile_start.astype(jnp.int32),
        tile_count.astype(jnp.int32),
        jnp.asarray(y_offset, jnp.int32).reshape(1),
        floor0,
        packed,
    )
    if want_depth:
        depth, pair, layers = outs
        depth = depth[:, :height, :width]
    else:
        pair, layers = outs
        depth = None
    return (
        KBuffer(depth=depth, pair=pair[:, :height, :width]),
        layers[:height, :width],
    )


def kbuffer_pallas(
    sorted_setup: jax.Array,
    bins: Bins,
    height: int,
    width: int,
    k: int = 4,
    reverse_z: bool = True,
    depth_floor: jax.Array | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    interpret: bool | None = None,
    y_offset=0,
    want_depth: bool = True,
):
    """K-layer raster of binned triangles with original pair ids.
    -> (KBuffer, layers (H, W) i32); see kbuffer_pallas_sorted."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kb, layers = kbuffer_pallas_sorted(
        sorted_setup,
        bins.tile_start,
        bins.tile_count,
        height,
        width,
        k=k,
        tile_h=tile_h,
        tile_w=tile_w,
        reverse_z=reverse_z,
        depth_floor=depth_floor,
        interpret=interpret,
        y_offset=y_offset,
        want_depth=want_depth,
    )
    hit = kb.pair >= 0
    pair = jnp.where(hit, bins.order[jnp.maximum(kb.pair, 0)], -1)
    return kb._replace(pair=pair), layers
