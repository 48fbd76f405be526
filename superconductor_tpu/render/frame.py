"""The frame function: one jitted call scene+frame-state -> image.

This is the TPU replacement for the whole per-frame GPU command stream
(render_desktop / render_everything, src/systems/rendering.rs:61-205,
506-558). Pass order matches the reference: opaque -> alpha-clip ->
[lines] -> skybox -> [particles] -> alpha-blend -> tonemap, except that
shading is deferred so the depth prepass is unnecessary by construction.

Everything dynamic comes in as arrays (uniforms, draw lists, joint
palette); everything shape-affecting is in RenderConfig (static arg, hashed
into the jit cache). Host code builds FrameState once per frame; the jit
boundary is render_frame().
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.binning import TILE_H, TILE_W, bin_triangles, gather_sorted_setup
from ..ops.geometry import DrawList, TriangleSetup, geometry_pass
from ..ops.raster_ref import VisibilityBuffer, empty_visibility, rasterize_ref
from ..ops.shade import interpolate_gbuffer, shade
from ..ops.sky import sample_skybox
from ..ops.tonemap import to_u8
from .env import EnvBindings


@dataclass(frozen=True)
class RenderConfig:
    width: int = 512
    height: int = 512
    t_cap: int = 1 << 14  # static-geometry triangle-pair capacity
    t_cap_anim: int = 1 << 10  # animated-geometry capacity
    p_cap: int = 1 << 16  # binned (triangle, tile) pair capacity
    raster: str = "auto"  # 'ref' | 'pallas' | 'auto'
    reverse_z: bool = True
    flip_viewport: bool = False
    inline_tonemapping: bool = True
    inline_srgb: bool = True
    num_views: int = 1
    blend_layers: int = 4  # K-buffer depth for alpha-clip/blend (0 = off)

    def resolve_raster(self) -> str:
        if self.raster != "auto":
            return self.raster
        return "pallas" if jax.default_backend() == "tpu" else "ref"


class FrameState(NamedTuple):
    """All per-frame device inputs."""

    uniforms: dict  # arrays with leading view axis
    draws_static: DrawList
    draws_animated: DrawList
    joint_palette: jax.Array  # (J, 8)


def _rasterize(tri: TriangleSetup, config: RenderConfig, init=None):
    method = config.resolve_raster()
    if method == "ref":
        return rasterize_ref(
            tri,
            config.height,
            config.width,
            reverse_z=config.reverse_z,
            init=init,
        )
    from ..ops.raster_pallas import rasterize_pallas

    bins = bin_triangles(tri, config.width, config.height, config.p_cap)
    sorted_setup = gather_sorted_setup(tri, bins)
    return rasterize_pallas(
        sorted_setup,
        bins,
        config.height,
        config.width,
        reverse_z=config.reverse_z,
        init=init,
    )


def _shade_view(
    scene: dict,
    tri: TriangleSetup,
    attrs,
    vis: VisibilityBuffer,
    uniforms: dict,
    view_index: int,
    config: RenderConfig,
    env: EnvBindings,
):
    h, w = config.height, config.width
    pair = vis.pair.reshape(-1)
    b0 = vis.b0.reshape(-1)
    b1 = vis.b1.reshape(-1)
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    px = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
    py = jnp.repeat(ys[:, None], w, axis=1).reshape(-1)

    gbuf = interpolate_gbuffer(pair, b0, b1, px, py, tri, attrs)
    rgb, alpha = shade(
        gbuf,
        scene,
        uniforms,
        view_index,
        env=env,
        inline_tonemapping=config.inline_tonemapping,
        inline_srgb=config.inline_srgb,
    )
    return rgb, alpha, gbuf


def render_view(
    scene: dict,
    state: FrameState,
    view_index: int,
    config: RenderConfig,
    env: EnvBindings,
):
    u = state.uniforms
    view_proj = u["view_proj"][view_index]

    # --- geometry: static draws ---
    tri, attrs = geometry_pass(
        state.draws_static,
        scene["indices"],
        scene["positions"],
        scene["normals"],
        scene["uvs"],
        scene["lightmap_uvs"],
        scene["tri_material"],
        scene["materials"],
        view_proj,
        config.width,
        config.height,
        config.t_cap,
        flip_viewport=config.flip_viewport,
    )

    # --- geometry: animated draws (skinned) ---
    tri_a, attrs_a = geometry_pass(
        state.draws_animated,
        scene["anim_indices"],
        scene["anim_positions"],
        scene["anim_normals"],
        scene["anim_uvs"],
        None,
        scene["anim_tri_material"],
        scene["materials"],
        view_proj,
        config.width,
        config.height,
        config.t_cap_anim,
        flip_viewport=config.flip_viewport,
        joint_palette=state.joint_palette,
        joint_indices=scene["anim_joint_indices"],
        joint_weights=scene["anim_joint_weights"],
    )

    # Merge static + animated into one pair list (offsets shift pair ids).
    import jax.tree_util as jtu

    merged_tri = TriangleSetup(
        setup=jnp.concatenate([tri.setup, tri_a.setup]),
        tri_id=jnp.concatenate([tri.tri_id, tri_a.tri_id]),
        inst_id=jnp.concatenate([tri.inst_id, tri_a.inst_id]),
        bbox=jnp.concatenate([tri.bbox, tri_a.bbox]),
        valid=jnp.concatenate([tri.valid, tri_a.valid]),
        num_valid=tri.num_valid + tri_a.num_valid,
    )
    merged_attrs = jtu.tree_map(
        lambda a, b: jnp.concatenate([a, b]), attrs, attrs_a
    )

    # --- pass 1: opaque (+ alpha-clip for now; K-buffer clip comes with
    # blend support) ---
    mats = scene["materials"]
    blend_mode = mats["blend_mode"][merged_attrs.material]
    opaque_tri = merged_tri._replace(valid=merged_tri.valid & (blend_mode != 2))
    vis = _rasterize(opaque_tri, config)

    rgb, alpha, gbuf = _shade_view(
        scene, merged_tri, merged_attrs, vis, u, view_index, config, env
    )

    # Alpha-clip correction: pixels whose winning fragment failed the alpha
    # test fall back to background for now (full K-layer clip resolve lands
    # with the blend pass).
    cutoff = mats["alpha_cutoff"][gbuf.material]
    clipped = (blend_mode[jnp.maximum(vis.pair.reshape(-1), 0)] == 1) & (
        alpha < cutoff
    )
    hit = gbuf.valid & ~clipped

    # --- skybox for misses ---
    sky = sample_skybox(
        scene,
        env,
        config.width,
        config.height,
        u["projection_inverse"][view_index],
        u["view_inverse_quat"][view_index],
        inline_tonemapping=config.inline_tonemapping,
        inline_srgb=config.inline_srgb,
    )
    rgb = jnp.where(hit[..., None], rgb, sky)

    img = jnp.concatenate(
        [rgb, jnp.ones_like(rgb[..., :1])], axis=-1
    ).reshape(config.height, config.width, 4)
    return img


@partial(jax.jit, static_argnames=("config", "env"))
def render_frame(
    scene: dict,
    state: FrameState,
    config: RenderConfig,
    env: EnvBindings = EnvBindings(),
):
    """Render all views; returns (V, H, W, 4) uint8."""
    views = [
        to_u8(render_view(scene, state, v, config, env))
        for v in range(config.num_views)
    ]
    return jnp.stack(views)
