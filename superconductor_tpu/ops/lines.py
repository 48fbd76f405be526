"""Line rendering: segments -> screen-space quads -> flat-color raster.

The reference's line pipeline (line_vertex/flat_colour shaders, shaders/
src/lib.rs:712-732; used for skeleton/bbox debug views, src/systems/
debugging.rs) draws 1px GPU lines. TPUs have no line primitive, so each
segment is expanded into a half-pixel-extruded quad (two triangles) in
screen space and goes through the same homogeneous raster path; colors come
from the reference's 16-entry debug palette (lib.rs:734-755).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import TriangleSetup

# The reference's DEBUG_COLOURS palette (shaders/src/lib.rs:734-751).
DEBUG_COLOURS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.1647],
        [0.0, 0.0, 0.3647],
        [0.0, 0.0, 0.6647],
        [0.0, 0.0, 0.9647],
        [0.0, 0.9255, 0.9255],
        [0.0, 0.5647, 0.0],
        [0.0, 0.7843, 0.0],
        [1.0, 1.0, 0.0],
        [0.90588, 0.75294, 0.0],
        [1.0, 0.5647, 0.0],
        [1.0, 0.0, 0.0],
        [0.8392, 0.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.6, 0.3333, 0.7882],
        [1.0, 1.0, 1.0],
    ],
    dtype=np.float32,
)


def line_geometry(
    line_pos: jax.Array,  # (L, 2, 3) world-space endpoints
    color_ids: jax.Array,  # (L,) i32
    valid: jax.Array,  # (L,) bool
    view_proj: jax.Array,  # (4, 4)
    width: int,
    height: int,
    line_width_px: float = 1.5,
    flip_viewport: bool = False,
):
    """Returns (TriangleSetup of 2L triangles, (2L, 3) flat colors).

    Setup rows use w=1 homogeneous coordinates (screen-space quads), so
    depth interpolates screen-linearly across the segment — fine for thin
    debug lines. Segments with an endpoint behind the near plane are
    dropped (the GPU would clip them; debug geometry doesn't warrant the
    clipping math).
    """
    l = line_pos.shape[0]
    p1 = jnp.concatenate([line_pos, jnp.ones((l, 2, 1), line_pos.dtype)], axis=-1)
    clip = jnp.einsum("lkc,rc->lkr", p1, view_proj)
    xc, yc, zc, wc = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    if flip_viewport:
        yc = -yc
    ok = jnp.all(wc > 1e-6, axis=1) & valid
    w_safe = jnp.maximum(wc, 1e-6)
    px = (xc / w_safe + 1.0) * (width * 0.5)
    py = (1.0 - yc / w_safe) * (height * 0.5)
    z = zc / w_safe

    d = jnp.stack([px[:, 1] - px[:, 0], py[:, 1] - py[:, 0]], axis=-1)
    dlen = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    ok = ok & (dlen[:, 0] > 1e-3)
    d = d / jnp.maximum(dlen, 1e-3)
    n = jnp.stack([-d[:, 1], d[:, 0]], axis=-1) * (line_width_px * 0.5)

    # Quad corners: 0 = p0 - n, 1 = p0 + n, 2 = p1 + n, 3 = p1 - n.
    c0 = jnp.stack([px[:, 0] - n[:, 0], py[:, 0] - n[:, 1], z[:, 0]], axis=-1)
    c1 = jnp.stack([px[:, 0] + n[:, 0], py[:, 0] + n[:, 1], z[:, 0]], axis=-1)
    c2 = jnp.stack([px[:, 1] + n[:, 0], py[:, 1] + n[:, 1], z[:, 1]], axis=-1)
    c3 = jnp.stack([px[:, 1] - n[:, 0], py[:, 1] - n[:, 1], z[:, 1]], axis=-1)

    tri_a = jnp.stack([c0, c1, c2], axis=1)  # (L, 3, [px, py, z])
    tri_b = jnp.stack([c0, c2, c3], axis=1)
    tris = jnp.concatenate([tri_a, tri_b])  # (2L, 3, 3)
    tri_ok = jnp.concatenate([ok, ok])
    corner_ids = jnp.concatenate(
        [
            jnp.arange(l, dtype=jnp.int32)[:, None] * 4
            + jnp.array([0, 1, 2], jnp.int32)[None, :],
            jnp.arange(l, dtype=jnp.int32)[:, None] * 4
            + jnp.array([0, 2, 3], jnp.int32)[None, :],
        ]
    )

    return _screen_space_setup(
        tris, tri_ok, width, height, vertex_ids=corner_ids
    ), jnp.concatenate([jnp.asarray(DEBUG_COLOURS)[color_ids % 16]] * 2)


def _screen_space_setup(
    tris: jax.Array, valid: jax.Array, width: int, height: int,
    vertex_ids=None,
) -> TriangleSetup:
    """TriangleSetup rows from screen-space (px, py, z_ndc) triangles
    (w = 1 homogeneous — used by lines and particles-in-screen-space)."""
    x, y, z = tris[..., 0], tris[..., 1], tris[..., 2]
    one = jnp.ones_like(x)

    def edge_coeffs(j, k):
        if vertex_ids is None:
            yj, wj, xj = y[:, j], one[:, j], x[:, j]
            yk, wk, xk = y[:, k], one[:, k], x[:, k]
            sign = 1.0
        else:
            swap = vertex_ids[:, j] > vertex_ids[:, k]
            sign = jnp.where(swap, -1.0, 1.0)

            def pick(arr):
                return (
                    jnp.where(swap, arr[:, k], arr[:, j]),
                    jnp.where(swap, arr[:, j], arr[:, k]),
                )

            (yj, yk) = pick(y)
            (wj, wk) = pick(one)
            (xj, xk) = pick(x)
        a = (yj * wk - yk * wj) * sign
        b = (wj * xk - wk * xj) * sign
        c = (xj * yk - xk * yj) * sign
        return a, b, c

    a0, b0, c0 = edge_coeffs(1, 2)
    a1, b1, c1 = edge_coeffs(2, 0)
    a2, b2, c2 = edge_coeffs(0, 1)
    m00, m01, m02 = x[:, 0], y[:, 0], one[:, 0]
    det = m00 * a0 + m01 * b0 + m02 * c0

    # Double-sided: flip edges so e_i > 0 inside regardless of orientation.
    flip = jnp.where(det < 0.0, -1.0, 1.0)
    edge = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2], axis=-1) * flip[:, None]
    setup = jnp.concatenate(
        [edge, z, one, jnp.zeros_like(x[:, :1])], axis=-1
    ).astype(jnp.float32)

    valid = valid & (det != 0.0)
    x0 = jnp.clip(jnp.floor(jnp.min(x, 1) - 0.5), 0, width - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(jnp.min(y, 1) - 0.5), 0, height - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(jnp.max(x, 1) + 0.5), 0, width - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(jnp.max(y, 1) + 0.5), 0, height - 1).astype(jnp.int32)
    offscreen = (
        (jnp.max(x, 1) < 0)
        | (jnp.max(y, 1) < 0)
        | (jnp.min(x, 1) > width - 1)
        | (jnp.min(y, 1) > height - 1)
    )
    valid = valid & ~offscreen
    t = tris.shape[0]
    return TriangleSetup(
        setup=setup,
        tri_id=jnp.arange(t, dtype=jnp.int32),
        inst_id=jnp.zeros(t, jnp.int32),
        bbox=jnp.stack([x0, y0, x1, y1], axis=-1),
        valid=valid,
        num_valid=jnp.sum(valid).astype(jnp.int32),
    )
