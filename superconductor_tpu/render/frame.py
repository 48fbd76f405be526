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

Band rendering: render_view accepts a (y_offset, band_height) viewport so
a device mesh can split the image into horizontal bands (parallel/bands.py)
— the multi-chip analog of wgpu's single-GPU submit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from ..ops.binning import bin_triangles, gather_sorted_setup
from ..ops.geometry import DrawList, TriangleSetup, geometry_pass
from ..ops.raster_ref import VisibilityBuffer, rasterize_ref
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


def _rasterize(
    tri: TriangleSetup,
    config: RenderConfig,
    band_height: int,
    y_offset,
    init=None,
):
    method = config.resolve_raster()
    if method == "ref":
        return rasterize_ref(
            tri,
            band_height,
            config.width,
            reverse_z=config.reverse_z,
            init=init,
            y_offset=y_offset,
        )
    from ..ops.raster_pallas import rasterize_pallas

    bins = bin_triangles(
        tri, config.width, band_height, config.p_cap, y_offset=y_offset
    )
    sorted_setup = gather_sorted_setup(tri, bins)
    return rasterize_pallas(
        sorted_setup,
        bins,
        band_height,
        config.width,
        reverse_z=config.reverse_z,
        init=init,
        y_offset=y_offset,
    )


def _pixel_centers(config: RenderConfig, band_height: int, y_offset):
    ys = jnp.arange(band_height, dtype=jnp.float32) + 0.5 + y_offset
    xs = jnp.arange(config.width, dtype=jnp.float32) + 0.5
    px = jnp.tile(xs[None, :], (band_height, 1)).reshape(-1)
    py = jnp.repeat(ys[:, None], config.width, axis=1).reshape(-1)
    return px, py


def _merged_geometry(scene, state, view_proj, config):
    """Static + animated geometry as one pair list."""
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
    merged_tri = TriangleSetup(
        setup=jnp.concatenate([tri.setup, tri_a.setup]),
        tri_id=jnp.concatenate([tri.tri_id, tri_a.tri_id]),
        inst_id=jnp.concatenate([tri.inst_id, tri_a.inst_id]),
        bbox=jnp.concatenate([tri.bbox, tri_a.bbox]),
        valid=jnp.concatenate([tri.valid, tri_a.valid]),
        num_valid=tri.num_valid + tri_a.num_valid,
    )
    merged_attrs = jtu.tree_map(lambda a, b: jnp.concatenate([a, b]), attrs, attrs_a)
    return merged_tri, merged_attrs


def render_view(
    scene: dict,
    state: FrameState,
    view_index: int,
    config: RenderConfig,
    env: EnvBindings,
    band_height: Optional[int] = None,
    y_offset=0,
):
    """Render one view (or one horizontal band of it) -> (bh, W, 4) f32."""
    band_height = band_height or config.height
    u = state.uniforms
    view_proj = u["view_proj"][view_index]

    merged_tri, merged_attrs = _merged_geometry(scene, state, view_proj, config)

    # --- pass 1: opaque + alpha-clip visibility ---
    mats = scene["materials"]
    blend_mode = mats["blend_mode"][merged_attrs.material]
    opaque_tri = merged_tri._replace(valid=merged_tri.valid & (blend_mode != 2))
    vis = _rasterize(opaque_tri, config, band_height, y_offset)

    px, py = _pixel_centers(config, band_height, y_offset)
    gbuf = interpolate_gbuffer(
        vis.pair.reshape(-1),
        vis.b0.reshape(-1),
        vis.b1.reshape(-1),
        px,
        py,
        merged_tri,
        merged_attrs,
    )
    rgb, alpha = shade(
        gbuf,
        scene,
        u,
        view_index,
        env=env,
        inline_tonemapping=config.inline_tonemapping,
        inline_srgb=config.inline_srgb,
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
        band_height,
        u["projection_inverse"][view_index],
        u["view_inverse_quat"][view_index],
        inline_tonemapping=config.inline_tonemapping,
        inline_srgb=config.inline_srgb,
        y_offset=y_offset,
        full_height=config.height,
    )
    rgb = jnp.where(hit[..., None], rgb, sky)

    img = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1).reshape(
        band_height, config.width, 4
    )
    return img


def render_frame_impl(
    scene: dict,
    state: FrameState,
    config: RenderConfig,
    env: EnvBindings = EnvBindings(),
):
    """Unjitted frame body (all views) -> (V, H, W, 4) uint8."""
    views = [
        to_u8(render_view(scene, state, v, config, env))
        for v in range(config.num_views)
    ]
    return jnp.stack(views)


render_frame = partial(jax.jit, static_argnames=("config", "env"))(render_frame_impl)
