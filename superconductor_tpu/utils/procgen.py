"""Procedural test content: UV spheres, checker textures, PBR materials.

The driver environment has no DamagedHelmet.glb, so the benchmark scene is
a procedural stand-in with comparable workload: a ~15k-triangle UV sphere
with full PBR material textures (albedo/normal/metallic-roughness/emissive)
— the same per-pixel shading cost and triangle density as the BASELINE.json
north-star scene.
"""

from __future__ import annotations

import numpy as np

from ..math3d import Similarity
from ..scene.scene import (
    MaterialSettings,
    Model,
    Primitive,
    PrimitiveLod,
    Scene,
    TEXFLAG_SRGB,
    build_mip_chain,
)


def uv_sphere(stacks: int = 88, slices: int = 88, radius: float = 1.0):
    """Positions/normals/uvs/indices for a UV sphere.

    stacks x slices of 88 gives 2*88*88 = 15,488 triangles — DamagedHelmet
    has 15,452.
    """
    phi = np.linspace(0, np.pi, stacks + 1)
    theta = np.linspace(0, 2 * np.pi, slices + 1)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    x = np.sin(pp) * np.cos(tt)
    y = np.cos(pp)
    z = np.sin(pp) * np.sin(tt)
    positions = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32) * radius
    normals = positions / radius
    u = (tt / (2 * np.pi)).reshape(-1)
    v = (pp / np.pi).reshape(-1)
    uvs = np.stack([u, v], axis=-1).astype(np.float32)

    idx = np.arange((stacks + 1) * (slices + 1)).reshape(stacks + 1, slices + 1)
    a = idx[:-1, :-1]
    b = idx[1:, :-1]
    c = idx[1:, 1:]
    d = idx[:-1, 1:]
    # Outward CCW winding (viewed from outside).
    t1 = np.stack([a, d, b], axis=-1).reshape(-1, 3)
    t2 = np.stack([b, d, c], axis=-1).reshape(-1, 3)
    indices = np.concatenate([t1, t2]).astype(np.uint32).reshape(-1)
    return positions, normals.astype(np.float32), uvs, indices


def checker_texture(size: int = 512, tiles: int = 16, c0=(200, 60, 40), c1=(240, 230, 220)):
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    mask = ((xx * tiles // size) + (yy * tiles // size)) % 2 == 0
    img = np.where(mask[..., None], np.array(c0, np.uint8), np.array(c1, np.uint8))
    return np.concatenate([img, np.full((size, size, 1), 255, np.uint8)], axis=-1)


def noise_normal_map(size: int = 512, strength: float = 0.4, seed: int = 7):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(size, size)).astype(np.float32)
    # blur to get smooth bumps
    for _ in range(4):
        h = (np.roll(h, 1, 0) + np.roll(h, -1, 0) + np.roll(h, 1, 1) + np.roll(h, -1, 1)) / 4
    dx = (np.roll(h, -1, 1) - np.roll(h, 1, 1)) * strength
    dy = (np.roll(h, -1, 0) - np.roll(h, 1, 0)) * strength
    n = np.stack([-dx, -dy, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rgb = np.clip((n * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    return np.concatenate([rgb, np.full((size, size, 1), 255, np.uint8)], axis=-1)


def mr_texture(size: int = 512):
    """Metallic-roughness: roughness in G varies, metallic in B varies."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    g = (yy * 255 // size).astype(np.uint8)
    b = ((xx * 2 % size) * 255 // size).astype(np.uint8)
    r = np.zeros_like(g)
    a = np.full_like(g, 255)
    return np.stack([r, g, b, a], axis=-1)


def add_pbr_sphere(scene: Scene, stacks: int = 88, slices: int = 88, name: str = "sphere") -> Model:
    """Insert the benchmark sphere + full PBR material set into the scene."""
    albedo = scene.textures.add_texture(
        build_mip_chain(checker_texture()), flags=TEXFLAG_SRGB
    )
    normal = scene.textures.add_texture(build_mip_chain(noise_normal_map()))
    mr = scene.textures.add_texture(build_mip_chain(mr_texture()))
    mat = scene.add_material(
        MaterialSettings(
            base_color_factor=(1.0, 1.0, 1.0, 1.0),
            metallic_factor=1.0,
            roughness_factor=1.0,
            albedo_tex=albedo,
            normal_tex=normal,
            metallic_roughness_tex=mr,
        )
    )
    pos, nrm, uv, idx = uv_sphere(stacks, slices)
    first, count, fv, vc = scene.insert_static_mesh(
        pos, nrm, uv, np.zeros_like(uv), idx, mat
    )
    prim = Primitive(
        material=mat,
        blend_mode=0,
        double_sided=False,
        animated=False,
        lods=[PrimitiveLod(first_index=first, index_count=count, first_vertex=fv, vertex_count=vc)],
        bounding_sphere_radius=1.0,
        bbox_min=pos.min(0),
        bbox_max=pos.max(0),
    )
    prim.transform = Similarity.identity()
    model = Model(primitives=[prim])
    model.bounding_sphere_radius = 1.0
    scene.models[name] = model
    return model


def gradient_cubemap(scene: Scene, size: int = 64) -> int:
    """Simple sky: vertical gradient + sun blob, 6 faces into the HDR pool.
    Returns the base texture id (faces consecutive)."""
    faces = []
    for face in range(6):
        uu, vv = np.meshgrid(
            np.linspace(-1, 1, size), np.linspace(-1, 1, size), indexing="xy"
        )
        # face direction math mirrors ops/texture.py sample_cubemap
        if face == 0:
            d = np.stack([np.ones_like(uu), -vv, -uu], -1)
        elif face == 1:
            d = np.stack([-np.ones_like(uu), -vv, uu], -1)
        elif face == 2:
            d = np.stack([uu, np.ones_like(uu), vv], -1)
        elif face == 3:
            d = np.stack([uu, -np.ones_like(uu), -vv], -1)
        elif face == 4:
            d = np.stack([uu, -vv, np.ones_like(uu)], -1)
        else:
            d = np.stack([-uu, -vv, -np.ones_like(uu)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        sky = np.array([0.35, 0.55, 0.95]) * (0.5 + 0.5 * d[..., 1:2].clip(0, 1))
        ground = np.array([0.25, 0.22, 0.2])
        col = np.where(d[..., 1:2] > 0, sky, ground[None, None])
        sun_dir = np.array([0.5, 0.6, 0.3])
        sun_dir /= np.linalg.norm(sun_dir)
        sun = np.clip((d @ sun_dir - 0.995) * 200, 0, 1)[..., None] * np.array(
            [20.0, 18.0, 15.0]
        )
        rgba = np.concatenate(
            [(col + sun).astype(np.float32), np.ones((size, size, 1), np.float32)],
            axis=-1,
        )
        faces.append(rgba)
    base = None
    for f in faces:
        tid = scene.textures_hdr.add_texture([f], wrap=1)
        if base is None:
            base = tid
    return base


def default_ambient_sh():
    """A daylight-ish constant SH (L0 + mild directional L1/L0 ratios)."""
    return (
        0.9, 0.9, 1.0,   # L0 rgb
        0.25, 0.22, 0.2,  # L1x/L0
        0.4, 0.4, 0.38,   # L1y/L0 (sky above)
        0.15, 0.15, 0.12,  # L1z/L0
    )
