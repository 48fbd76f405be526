"""In-row mip tables: the select-ladder trilinear path is bit-exact vs
the mip_owh2 descriptor-gather path.

The material row (scene.py mat_row) carries each texture's full mip
placement table; sample_trilinear then selects the pixel's level with a
static select ladder (ops/texture.py _select_level) instead of a
per-pixel mip_owh2 gather — one less gathered row per material texture
per pixel, pure-VPU selection instead.
"""

import numpy as np
import jax.numpy as jnp

import superconductor_tpu as sc
from superconductor_tpu.ops.shade import _material_rows
from superconductor_tpu.ops.texture import (
    _select_level,
    ldr_pool,
    sample_anisotropic,
    sample_trilinear,
)
from superconductor_tpu.scene.scene import (
    MaterialSettings,
    TEXFLAG_SRGB,
    build_mip_chain,
)


def _scene_with_textures(sizes, seed=0):
    scene = sc.Scene()
    rng = np.random.default_rng(seed)
    ids = []
    for s in sizes:
        img = rng.integers(0, 255, (s[0], s[1], 4), np.uint8)
        ids.append(
            scene.textures.add_texture(
                build_mip_chain(img), flags=TEXFLAG_SRGB if s[0] % 2 else 0
            )
        )
    return scene, ids


def test_select_level_matches_indexing():
    rng = np.random.default_rng(1)
    levels = jnp.asarray(rng.integers(0, 1000, (64, 7, 3), np.int32))
    lvl = jnp.asarray(rng.integers(-2, 9, (64,), np.int32))
    got = np.asarray(_select_level(levels, lvl))
    want = np.asarray(levels)[
        np.arange(64), np.clip(np.asarray(lvl), 0, 6)
    ]
    np.testing.assert_array_equal(got, want)


def test_ladder_trilinear_bit_exact_vs_mip_owh2():
    scene, ids = _scene_with_textures(
        [(64, 64), (128, 32), (17, 23), (256, 256)]
    )
    for tid in ids:
        scene.add_material(MaterialSettings(albedo_tex=tid))
    dev = scene.device_arrays()
    texels = ldr_pool(dev)
    tex = dev["tex"]
    m = dev["materials"]
    rng = np.random.default_rng(2)
    P = 4096
    mat = jnp.asarray(rng.integers(0, len(ids), (P,), np.int32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-1.0, 12.0, (P,)).astype(np.float32))

    pf, pi, mtm, mlv = _material_rows(m, mat)
    assert mlv is not None, "scene must publish the in-row mip table"
    meta = mtm[..., 0:6]
    lv = mlv[..., 0, :, :]

    got = sample_trilinear(texels, tex, pi[..., 0], uv, lod,
                           meta=meta, levels_owh=lv)
    want = sample_trilinear(texels, tex, pi[..., 0], uv, lod, meta=meta)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ladder_aniso_bit_exact():
    scene, ids = _scene_with_textures([(64, 64), (31, 9)], seed=3)
    for tid in ids:
        scene.add_material(MaterialSettings(albedo_tex=tid))
    dev = scene.device_arrays()
    texels = ldr_pool(dev)
    tex = dev["tex"]
    m = dev["materials"]
    rng = np.random.default_rng(4)
    P = 2048
    mat = jnp.asarray(rng.integers(0, len(ids), (P,), np.int32))
    uv = jnp.asarray(rng.uniform(0, 1, (P, 2)).astype(np.float32))
    duvdx = jnp.asarray(rng.uniform(-0.1, 0.1, (P, 2)).astype(np.float32))
    duvdy = jnp.asarray(rng.uniform(-0.1, 0.1, (P, 2)).astype(np.float32))

    pf, pi, mtm, mlv = _material_rows(m, mat)
    meta = mtm[..., 0:6]
    lv = mlv[..., 0, :, :]
    for taps in (1, 4):
        got = sample_anisotropic(texels, tex, pi[..., 0], uv, duvdx, duvdy,
                                 taps, meta=meta, levels_owh=lv)
        want = sample_anisotropic(texels, tex, pi[..., 0], uv, duvdx, duvdy,
                                  taps, meta=meta)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mat_row_streaming_stable_width():
    """The mat_row width is sized by FULL chains, so streaming mip-view
    pumps never change the row shape (no recompiles mid-stream)."""
    scene, ids = _scene_with_textures([(128, 128)], seed=5)
    scene.add_material(MaterialSettings(albedo_tex=ids[0]))
    full = np.asarray(scene.device_materials()["mat_row"]).shape
    # preview: only the smallest 2 mips visible
    pool = scene.textures
    count = pool.tex_mip_count[ids[0]]
    pool.set_mip_view(ids[0], count - 2, 2)
    scene._materials_dirty = True
    preview = np.asarray(scene.device_materials()["mat_row"]).shape
    pool.restore_mip_view(ids[0])
    scene._materials_dirty = True
    restored = np.asarray(scene.device_materials()["mat_row"]).shape
    assert full == preview == restored
