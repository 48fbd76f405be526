"""Reference (pure-jnp, brute-force) rasterizer.

An independent, simple implementation of the visibility pass used to
cross-validate the Pallas tile kernel and to run tiny CPU-only configs:
every triangle is evaluated against the full image in chunks under
``lax.scan``. O(T * H * W) — fine for test scenes, never the production
path.

Output is the same visibility buffer the tile kernel produces:
  depth (H, W) f32 — reverse-z by default (0 = far, larger = nearer)
  pair  (H, W) i32 — index into the TriangleSetup arrays, -1 = miss

Barycentrics are NOT stored: the deferred stage recomputes them from the
winner's setup row (which interpolate_gbuffer gathers anyway for the
analytic derivatives) — e_i(px, py) / sum(e), bit-identical arithmetic to
what the raster kernel would have produced. Dropping the two f32 planes
saves 8 bytes/px of HBM write+read per pass (x K layers in the k-buffer
kernels) and two divides per winning pixel in the raster inner loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import TriangleSetup


class VisibilityBuffer(NamedTuple):
    depth: jax.Array
    pair: jax.Array


def empty_visibility(height: int, width: int, reverse_z: bool = True):
    far = 0.0 if reverse_z else 1.0
    return VisibilityBuffer(
        depth=jnp.full((height, width), far, jnp.float32),
        pair=jnp.full((height, width), -1, jnp.int32),
    )


def _tie(a, b):
    """Edge tie-break bit: accept e == 0 iff (a, b) lexicographically > 0."""
    return (a > 0) | ((a == 0) & (b > 0))


def taint_with(vis: VisibilityBuffer, y_offset) -> VisibilityBuffer:
    """Propagate y_offset's varying-manual-axes onto a fresh (constant)
    visibility buffer. Under shard_map with check_vma=True, a lax.scan whose
    carry starts replicated but becomes band-varying (because the setup
    inputs depend on the band's y_offset) is a type error; adding
    0 * y_offset marks the init as varying up front. Outside shard_map
    y_offset is a plain 0 and this folds away."""
    zf = jnp.asarray(y_offset, jnp.float32) * 0.0
    zi = jnp.asarray(y_offset, jnp.int32) * 0
    return VisibilityBuffer(depth=vis.depth + zf, pair=vis.pair + zi)


def rasterize_ref(
    tri: TriangleSetup,
    height: int,
    width: int,
    reverse_z: bool = True,
    chunk: int = 8,
    init: VisibilityBuffer | None = None,
    y_offset=0,
) -> VisibilityBuffer:
    """Brute-force visibility rasterization over the band
    [y_offset, y_offset + height) at full image width."""
    t = tri.setup.shape[0]
    pad = (-t) % chunk
    setup = jnp.pad(tri.setup, ((0, pad), (0, 0)))
    valid = jnp.pad(tri.valid, (0, pad))

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5 + y_offset
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px = xs[None, :]  # (1, W)
    py = ys[:, None]  # (H, 1)

    vis = (
        init
        if init is not None
        else taint_with(empty_visibility(height, width, reverse_z), y_offset)
    )

    def body(carry, inp):
        depth, pair = carry
        s, v, base = inp  # s: (chunk, 16)

        def one(i, carry):
            depth, pair = carry
            row = s[i]
            e0 = row[0] * px + row[1] * py + row[2]
            e1 = row[3] * px + row[4] * py + row[5]
            e2 = row[6] * px + row[7] * py + row[8]
            # Fill rule: a pixel exactly on an edge (e == 0) belongs to the
            # triangle whose edge coefficients are lexicographically
            # positive. Shared edges have exact-negation coefficients
            # (_setup_from_clip canonical operand order), so adjacent
            # triangles partition edge pixels exactly — no double-blend, no
            # holes (the software analog of the GPU top-left rule).
            ok0 = jnp.where(_tie(row[0], row[1]), e0 >= 0, e0 > 0)
            ok1 = jnp.where(_tie(row[3], row[4]), e1 >= 0, e1 > 0)
            ok2 = jnp.where(_tie(row[6], row[7]), e2 >= 0, e2 > 0)
            inside = ok0 & ok1 & ok2 & v[i]
            zsum = e0 * row[9] + e1 * row[10] + e2 * row[11]
            wsum = e0 * row[12] + e1 * row[13] + e2 * row[14]
            inside = inside & (wsum > 0)
            z = zsum / jnp.where(wsum == 0, 1.0, wsum)
            zin = (z >= 0.0) & (z <= 1.0)
            if reverse_z:
                win = inside & zin & (z > depth)
            else:
                win = inside & zin & (z < depth)
            new_depth = jnp.where(win, z, depth)
            new_pair = jnp.where(win, base + i, pair)
            return new_depth, new_pair

        carry = jax.lax.fori_loop(0, chunk, one, (depth, pair))
        return carry, None

    n_chunks = setup.shape[0] // chunk
    s_chunks = setup.reshape(n_chunks, chunk, 16)
    v_chunks = valid.reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)

    (depth, pair), _ = jax.lax.scan(
        body, (vis.depth, vis.pair), (s_chunks, v_chunks, bases)
    )
    return VisibilityBuffer(depth=depth, pair=pair)
