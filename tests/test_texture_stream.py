"""Async texture streaming: dummy hot-swap + progressive KTX2 mips."""

import io
import json
import time

import numpy as np

from superconductor_tpu.assets.fetch import MemoryClient
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.assets.texture_stream import TextureStreamer
from superconductor_tpu.scene.scene import Scene, TEX_DUMMY_WHITE


def _png_bytes(color=(30, 200, 60, 255), size=8):
    from PIL import Image

    img = Image.new("RGBA", (size, size), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _textured_quad_gltf():
    """Minimal glTF (json) with an external texture reference."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + uv.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": "tex.png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "buffers": [{"uri": "geom.bin", "byteLength": len(blob)}],
    }
    return json.dumps(doc).encode(), blob


def test_async_texture_hot_swap():
    gltf, blob = _textured_quad_gltf()
    client = MemoryClient(
        {"scene.gltf": gltf, "geom.bin": blob, "tex.png": _png_bytes()}
    )
    # MemoryClient.resolve default: urljoin; patch for flat keys.
    client.resolve = lambda base, rel: rel

    scene = Scene()
    streamer = TextureStreamer(client)
    model = load_model(
        scene, gltf, url="scene.gltf", client=client, streamer=streamer
    )
    mat = scene.materials[model.primitives[0].material]
    # Immediately after load: dummy bound.
    assert mat.albedo_tex == TEX_DUMMY_WHITE

    # Wait for the decode and pump.
    deadline = time.time() + 10
    applied = 0
    while time.time() < deadline and mat.albedo_tex == TEX_DUMMY_WHITE:
        applied += streamer.pump(scene)
        time.sleep(0.01)
    assert mat.albedo_tex != TEX_DUMMY_WHITE
    # swapped texture has real content (green-ish texel)
    base = scene.textures.tex_mip_base[mat.albedo_tex]
    off = scene.textures.mip_offset[base]
    texel = scene.textures.texels.host[off]
    assert texel[1] > 150 and texel[0] < 80


def test_sync_load_unchanged():
    gltf, blob = _textured_quad_gltf()
    client = MemoryClient(
        {"scene.gltf": gltf, "geom.bin": blob, "tex.png": _png_bytes()}
    )
    client.resolve = lambda base, rel: rel
    scene = Scene()
    model = load_model(scene, gltf, url="scene.gltf", client=client)
    mat = scene.materials[model.primitives[0].material]
    assert mat.albedo_tex != TEX_DUMMY_WHITE  # loaded inline
