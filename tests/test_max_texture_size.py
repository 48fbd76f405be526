"""Max-texture-size downscaling: leading mips above the cap are dropped
(downscaling_for_max_size, textures.rs:609-614, applied at :714 and :989
with device.limits().max_texture_dimension_2d)."""

import time

import numpy as np

from superconductor_tpu.assets.fetch import MemoryClient
from superconductor_tpu.assets.texture_stream import TextureStreamer
from superconductor_tpu.scene.scene import (
    MaterialSettings,
    Scene,
    TEX_DUMMY_WHITE,
    mip_skip_for_max_size,
)

from test_texture_lifecycle import _chain, _pump_until, make_rgba8_ktx2
from test_texture_stream import _png_bytes, _textured_quad_gltf


def _finest_dims(scene, tex_id, pool=None):
    pool = pool or scene.textures
    base = pool.tex_mip_base[tex_id]
    return pool.mip_h[base], pool.mip_w[base]


def test_mip_skip_math():
    # Same semantics as the reference: floor(log2(size)) - floor(log2(max)).
    assert mip_skip_for_max_size(256, 256, 64) == 2
    assert mip_skip_for_max_size(256, 16, 64) == 2  # larger axis rules
    assert mip_skip_for_max_size(100, 30, 64) == 0  # truncated log2 parity
    assert mip_skip_for_max_size(64, 64, 64) == 0
    assert mip_skip_for_max_size(8, 8, 1) == 3
    assert mip_skip_for_max_size(4096, 4096, None) == 0  # unlimited


def test_sync_gltf_load_respects_cap():
    gltf, blob = _textured_quad_gltf()
    client = MemoryClient(
        {"scene.gltf": gltf, "geom.bin": blob, "tex.png": _png_bytes(size=8)}
    )
    client.resolve = lambda base, rel: rel
    scene = Scene()
    scene.max_texture_size = 2
    from superconductor_tpu.assets.models import load_model

    model = load_model(scene, gltf, url="scene.gltf", client=client)
    mat = scene.materials[model.primitives[0].material]
    assert mat.albedo_tex != TEX_DUMMY_WHITE
    h, w = _finest_dims(scene, mat.albedo_tex)
    assert (h, w) == (2, 2)
    # chain continues down to 1x1
    assert scene.textures.tex_mip_count[mat.albedo_tex] == 2


def test_streamed_png_respects_cap():
    gltf, blob = _textured_quad_gltf()
    client = MemoryClient(
        {"scene.gltf": gltf, "geom.bin": blob, "tex.png": _png_bytes(size=8)}
    )
    client.resolve = lambda base, rel: rel
    scene = Scene()
    streamer = TextureStreamer(client, max_texture_size=2)
    from superconductor_tpu.assets.models import load_model

    model = load_model(
        scene, gltf, url="scene.gltf", client=client, streamer=streamer
    )
    mat = scene.materials[model.primitives[0].material]
    assert _pump_until(
        streamer, scene, lambda: mat.albedo_tex != TEX_DUMMY_WHITE
    )
    h, w = _finest_dims(scene, mat.albedo_tex)
    assert (h, w) == (2, 2)


def test_streamed_ktx2_respects_cap():
    """KTX2 streaming decodes only levels under the cap; preview still works
    and the final in-place swap matches the clamped layout."""
    chain = _chain((10, 200, 30, 255), size=16)  # 16,8,4,2,1
    ktx = make_rgba8_ktx2(chain)
    client = MemoryClient({"tex.ktx2": ktx})
    scene = Scene()
    streamer = TextureStreamer(client, max_texture_size=4)
    mat = scene.add_material(MaterialSettings())
    used_before = scene.textures.texels.alloc.used()

    streamer.request(mat, "albedo_tex", "tex.ktx2", srgb=True)
    assert _pump_until(
        streamer, scene,
        lambda: scene.materials[mat].albedo_tex != TEX_DUMMY_WHITE
        and streamer.idle,
    )
    tex_id = scene.materials[mat].albedo_tex
    h, w = _finest_dims(scene, tex_id)
    assert (h, w) == (4, 4)
    assert scene.textures.tex_mip_count[tex_id] == 3  # 4,2,1
    # exactly the clamped chain's texels were allocated (no 16/8 levels)
    used_after = scene.textures.texels.alloc.used()
    assert used_after - used_before == 16 + 4 + 1
    # content survived the clamp
    base = scene.textures.tex_mip_base[tex_id]
    off = scene.textures.mip_offset[base]
    texel = scene.textures.texels.host[off]
    assert texel[1] > 150 and texel[0] < 80


def test_ibl_cubemap_respects_cap():
    import os

    path = "/root/reference/demo/web/assets/cubemaps/noon.ktx2"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference cubemap absent")
    from superconductor_tpu.assets.environment import load_ibl_cubemap

    data = open(path, "rb").read()
    scene = Scene()
    scene.max_texture_size = 8
    base = load_ibl_cubemap(scene, data)
    h, w = _finest_dims(scene, base, pool=scene.textures_hdr)
    assert max(h, w) <= 8
