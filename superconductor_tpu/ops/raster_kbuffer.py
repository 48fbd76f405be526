"""K-layer visibility (k-buffer) for alpha-clipped and alpha-blended passes.

The reference handles transparency with hardware blending in submission
order after a CPU sort (alpha-blend primitives drawn last,
rendering.rs:550; particles CPU-sorted back-to-front, systems.rs:384-407).
A deferred TPU pipeline can't shade during rasterization, so transparency
uses a k-buffer: the raster pass keeps the K nearest fragments per pixel
(depth-sorted in registers), shading evaluates all K layers vectorized,
and the composite blends back-to-front. Alpha-clip uses the same machinery:
evaluate the alpha test on the K nearest candidates and keep the nearest
passing one (K deep enough to see through up to K-1 failing layers).

This module is the pure-jnp reference implementation; the Pallas kernel
variant lives in raster_pallas.py (kbuffer_pallas).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import TriangleSetup
from .raster_ref import _tie


class KBuffer(NamedTuple):
    """Per-pixel K nearest fragments, slot 0 = nearest. Shapes (K, H, W).

    Barycentrics are not stored (see raster_ref.VisibilityBuffer): the
    shading stage recomputes them from the layer's pair id — halving the
    k-buffer's HBM footprint and the insert chain's shift state."""

    depth: jax.Array  # None when produced with want_depth=False (Pallas)
    pair: jax.Array  # -1 = empty


def empty_kbuffer(k: int, height: int, width: int, reverse_z: bool = True):
    far = 0.0 if reverse_z else 1.0
    return KBuffer(
        depth=jnp.full((k, height, width), far, jnp.float32),
        pair=jnp.full((k, height, width), -1, jnp.int32),
    )


def kbuffer_insert(kb: KBuffer, z, pair, accept, reverse_z: bool = True):
    """Insert one fragment candidate per pixel into the sorted k-buffer.

    z, pair, accept: (H, W) arrays. Returns the new KBuffer.
    Slot order: nearest first (descending z for reverse-z).
    """
    k = kb.depth.shape[0]
    if reverse_z:
        nearer = z[None] >= kb.depth  # (K, H, W): new frag nearer than slot
    else:
        nearer = z[None] <= kb.depth
    # rank = number of existing slots strictly nearer than the new fragment
    rank = jnp.sum(~nearer & (kb.pair >= 0), axis=0)
    # But empty slots count as "not nearer"; fragments always beat empties.
    # rank is where the new fragment lands (0 = nearest).
    rank = jnp.where(accept, rank, k)  # rejected: lands past the end

    def slot(idx):
        is_new = rank == idx
        shifted = rank < idx
        prev = idx - 1
        d = jnp.where(
            is_new, z, jnp.where(shifted, kb.depth[prev] if prev >= 0 else z, kb.depth[idx])
        )
        p = jnp.where(
            is_new, pair, jnp.where(shifted, kb.pair[prev] if prev >= 0 else pair, kb.pair[idx])
        )
        return d, p

    slots = [slot(i) for i in range(k)]
    return KBuffer(
        depth=jnp.stack([s[0] for s in slots]),
        pair=jnp.stack([s[1] for s in slots]),
    )


def rasterize_kbuffer_ref(
    tri: TriangleSetup,
    height: int,
    width: int,
    k: int = 4,
    reverse_z: bool = True,
    chunk: int = 8,
    depth_floor=None,  # (H, W): only keep fragments nearer than this
    y_offset=0,
):
    """Brute-force K-layer rasterization (reference / CPU path).

    Returns (KBuffer, layers (H, W) i32): layers counts every accepted
    fragment per pixel — including those ranked past K that the buffer had
    to drop — so the caller can detect K overflow and grow blend_layers
    instead of silently losing a surface (the reference draws *all* blended
    fragments, rendering.rs:550; never-drop policy)."""
    t = tri.setup.shape[0]
    pad = (-t) % chunk
    setup = jnp.pad(tri.setup, ((0, pad), (0, 0)))
    valid = jnp.pad(tri.valid, (0, pad))

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5 + y_offset
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px = xs[None, :]
    py = ys[:, None]

    kb0 = empty_kbuffer(k, height, width, reverse_z)
    # Taint the scan carry with y_offset's varying axes (see
    # raster_ref.taint_with) so shard_map's check_vma accepts the scan.
    zf = jnp.asarray(y_offset, jnp.float32) * 0.0
    zi = jnp.asarray(y_offset, jnp.int32) * 0
    kb0 = KBuffer(depth=kb0.depth + zf, pair=kb0.pair + zi)
    layers0 = jnp.zeros((height, width), jnp.int32) + zi
    if depth_floor is None:
        depth_floor = jnp.full((height, width), 0.0 if reverse_z else 1.0)

    def body(carry, inp):
        s_chunk, v_chunk, base = inp

        def one(i, carry):
            kb, layers = carry
            row = s_chunk[i]
            e0 = row[0] * px + row[1] * py + row[2]
            e1 = row[3] * px + row[4] * py + row[5]
            e2 = row[6] * px + row[7] * py + row[8]
            # Fill rule (see raster_ref._tie): edge pixels partition exactly
            # between adjacent triangles — critical here, where a double
            # count means a surface blends twice along the shared edge.
            ok0 = jnp.where(_tie(row[0], row[1]), e0 >= 0, e0 > 0)
            ok1 = jnp.where(_tie(row[3], row[4]), e1 >= 0, e1 > 0)
            ok2 = jnp.where(_tie(row[6], row[7]), e2 >= 0, e2 > 0)
            inside = ok0 & ok1 & ok2 & v_chunk[i]
            zsum = e0 * row[9] + e1 * row[10] + e2 * row[11]
            wsum = e0 * row[12] + e1 * row[13] + e2 * row[14]
            inside = inside & (wsum > 0)
            z = zsum / jnp.where(wsum == 0, 1.0, wsum)
            inside = inside & (z >= 0.0) & (z <= 1.0)
            if reverse_z:
                accept = inside & (z > depth_floor)
            else:
                accept = inside & (z < depth_floor)
            kb = kbuffer_insert(
                kb,
                z,
                jnp.full_like(kb.pair[0], base + i),
                accept,
                reverse_z,
            )
            return kb, layers + accept.astype(jnp.int32)

        return jax.lax.fori_loop(0, chunk, one, carry), None

    n_chunks = setup.shape[0] // chunk
    s_chunks = setup.reshape(n_chunks, chunk, 16)
    v_chunks = valid.reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)

    (kb, layers), _ = jax.lax.scan(
        body, (kb0, layers0), (s_chunks, v_chunks, bases)
    )
    return kb, layers
