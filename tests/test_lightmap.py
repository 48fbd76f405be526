"""Lightmapped geometry: TEXCOORD_1 -> is_lightmapped -> SH lightmap path."""

import json
import os
import struct

import numpy as np
import pytest

from superconductor_tpu import (
    Camera,
    EnvBindings,
    RenderConfig,
    Scene,
    Similarity,
    make_uniforms,
    render_frame,
)
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.render.draws import build_frame_state

BCN = "/root/reference/demo/web/assets/lighting/bcn"


def make_lightmapped_glb():
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv2 = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + uv.tobytes() + uv2.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": 0,
                            "TEXCOORD_0": 1,
                            "TEXCOORD_1": 2,
                        },
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [{"pbrMetallicRoughness": {"metallicFactor": 0.0}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 32},
            {"buffer": 0, "byteOffset": 112, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    j = json.dumps(doc).encode()
    j += b" " * (-len(j) % 4)
    blob += b"\0" * (-len(blob) % 4)
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(j) + 8 + len(blob))
    out += struct.pack("<II", len(j), 0x4E4F534A) + j
    out += struct.pack("<II", len(blob), 0x004E4942) + blob
    return out


def test_lightmapped_flag_loads():
    scene = Scene()
    model = load_model(scene, make_lightmapped_glb(), name="lm")
    assert model.primitives[0].lods[0].lightmapped


def test_lightmap_lighting_renders():
    """Real Sponza BC7/BC6H lightmaps light a lightmapped quad."""
    if not os.path.exists(f"{BCN}/lightmap.ktx2"):
        pytest.skip("reference assets unavailable")
    from superconductor_tpu.assets.environment import load_lightmaps

    scene = Scene()
    model = load_model(scene, make_lightmapped_glb(), name="lm")
    load_lightmaps(
        scene,
        open(f"{BCN}/lightmap.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_x.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_y.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_z.ktx2", "rb").read(),
    )
    env = EnvBindings.from_scene(scene)
    assert env.lightmap_tex_ids is not None

    camera = Camera(position=np.array([0, 0, 2.5], np.float32))
    uniforms = make_uniforms(camera, 48, 48)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=48, height=48, t_cap=16, t_cap_anim=8, raster="ref")
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    # The quad is lit by lightmap content (non-black, non-uniform).
    inner = img[16:32, 16:32, :3]
    assert inner.mean() > 8


def test_lightmap_sh_packed_matches_layered():
    """The SH-interleaved lightmap path (Scene.device_lightmap_sh +
    sample_lightmap_sh: ONE gather) must reproduce the four-texture
    bilinear path exactly (sample_spherical_harmonics picks the packed
    path whenever the scene publishes "lm_sh")."""
    if not os.path.exists(f"{BCN}/lightmap.ktx2"):
        pytest.skip("reference assets unavailable")
    import jax.numpy as jnp

    from superconductor_tpu.assets.environment import load_lightmaps
    from superconductor_tpu.ops.shade import GBuffer, sample_spherical_harmonics

    scene = Scene()
    load_lightmaps(
        scene,
        open(f"{BCN}/lightmap.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_x.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_y.ktx2", "rb").read(),
        open(f"{BCN}/lightmap_z.ktx2", "rb").read(),
    )
    env = EnvBindings.from_scene(scene)
    assert env.lightmap_wh is not None
    d = scene.device_arrays()
    assert "lm_sh" in d
    d_layered = {k: v for k, v in d.items() if k != "lm_sh"}

    rng = np.random.default_rng(11)
    n = 512
    uv = rng.uniform(-0.2, 1.2, size=(n, 2)).astype(np.float32)  # incl. clamp
    gbuf = GBuffer(
        valid=None, world_pos=jnp.zeros((n, 3), jnp.float32), normal=None,
        uv=None, lm_uv=jnp.asarray(uv), material=None, front_facing=None,
        lightmapped=jnp.ones((n,), bool),
        dpdx=None, dpdy=None, duvdx=None, duvdy=None,
    )
    uniforms = {
        "probes_bottom_left": jnp.zeros((3,), jnp.float32),
        "probes_scale": jnp.ones((3,), jnp.float32),
    }
    sh_packed = np.asarray(sample_spherical_harmonics(gbuf, d, uniforms, env))
    sh_layered = np.asarray(
        sample_spherical_harmonics(gbuf, d_layered, uniforms, env)
    )
    assert sh_packed.shape == (n, 4, 3)
    np.testing.assert_allclose(sh_packed, sh_layered, rtol=0, atol=2e-6)
