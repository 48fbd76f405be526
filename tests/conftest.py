"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run anywhere, before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin re-registers itself even when JAX_PLATFORMS=cpu is in
# the environment; forcing the config keeps the test suite on 8 virtual CPU
# devices everywhere.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_ASSETS = "/root/reference/demo/web/assets"


@pytest.fixture
def sponza_cubes_glb():
    path = os.path.join(REFERENCE_ASSETS, "models/sponza_cubes.glb")
    if not os.path.exists(path):
        pytest.skip("reference assets not available")
    with open(path, "rb") as f:
        return f.read()


def make_box_glb(alpha_mode: str = None, base_color=(1.0, 0.2, 0.1, 1.0)) -> bytes:
    """Author a minimal GLB (unit cube, one material) in-memory.

    alpha_mode: None (opaque) | 'MASK' | 'BLEND' on the material."""
    import json
    import struct

    # 8 corners, 12 tris, CCW outward.
    p = np.array(
        [
            [-0.5, -0.5, -0.5],
            [0.5, -0.5, -0.5],
            [0.5, 0.5, -0.5],
            [-0.5, 0.5, -0.5],
            [-0.5, -0.5, 0.5],
            [0.5, -0.5, 0.5],
            [0.5, 0.5, 0.5],
            [-0.5, 0.5, 0.5],
        ],
        np.float32,
    )
    tris = np.array(
        [
            [4, 5, 6], [4, 6, 7],  # +z
            [1, 0, 3], [1, 3, 2],  # -z
            [5, 1, 2], [5, 2, 6],  # +x
            [0, 4, 7], [0, 7, 3],  # -x
            [7, 6, 2], [7, 2, 3],  # +y
            [0, 1, 5], [0, 5, 4],  # -y
        ],
        np.uint16,
    )
    pos_bytes = p.tobytes()
    idx_bytes = tris.tobytes()
    bin_data = pos_bytes + idx_bytes
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": list(base_color),
                    "metallicFactor": 0.0,
                    "roughnessFactor": 1.0,
                },
                "extensions": {"KHR_materials_unlit": {}},
                **({"alphaMode": alpha_mode} if alpha_mode else {}),
            }
        ],
        "extensionsUsed": ["KHR_materials_unlit"],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 8,
                "type": "VEC3",
                "min": p.min(0).tolist(),
                "max": p.max(0).tolist(),
            },
            {
                "bufferView": 1,
                "componentType": 5123,
                "count": 36,
                "type": "SCALAR",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {
                "buffer": 0,
                "byteOffset": len(pos_bytes),
                "byteLength": len(idx_bytes),
            },
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    bin_data += b"\0" * (-len(bin_data) % 4)
    out = b""
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_data)
    out += struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    out += struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    return out


@pytest.fixture
def box_glb():
    return make_box_glb()


def make_skinned_glb() -> bytes:
    """Author a minimal skinned GLB: a vertical 2-quad ribbon bound to two
    joints; joint 1 rotates 90deg about Z over 1s (LINEAR)."""
    import json
    import struct

    # 6 vertices: rows at y=0,1,2; x = +-0.1
    pos = np.array(
        [[-0.1, 0, 0], [0.1, 0, 0], [-0.1, 1, 0], [0.1, 1, 0], [-0.1, 2, 0], [0.1, 2, 0]],
        np.float32,
    )
    tris = np.array([[0, 1, 3], [0, 3, 2], [2, 3, 5], [2, 5, 4]], np.uint16)
    joints = np.array(
        [[0, 0, 0, 0]] * 2 + [[0, 1, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.uint16
    )
    weights = np.array(
        [[1, 0, 0, 0]] * 2 + [[0.5, 0.5, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2,
        np.float32,
    )
    # Inverse bind matrices (glTF stores column-major flat: translation at
    # flat elements 12..14): joint0 identity, joint1 translates y by -1.
    ibm_colmajor = np.stack([np.eye(4, dtype=np.float32)] * 2)
    ibm_colmajor[1][3][1] = -1.0  # flat element 13 = ty
    ibm_bytes = ibm_colmajor.reshape(2, 16).tobytes()

    times = np.array([0.0, 1.0], np.float32)
    import math

    q0 = np.array([0, 0, 0, 1], np.float32)
    s, c = math.sin(math.pi / 4), math.cos(math.pi / 4)
    q1 = np.array([0, 0, s, c], np.float32)
    rots = np.stack([q0, q1])

    blob = b""
    views = []
    accessors = []

    def add(data, target=None, ctype=None, count=None, type_=None, **extra):
        nonlocal blob
        off = len(blob)
        b = data.tobytes() if hasattr(data, "tobytes") else data
        blob += b + b"\0" * ((-len(b)) % 4)
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(b)})
        accessors.append(
            {
                "bufferView": len(views) - 1,
                "componentType": ctype,
                "count": count,
                "type": type_,
                **extra,
            }
        )
        return len(accessors) - 1

    a_pos = add(pos, ctype=5126, count=6, type_="VEC3",
                min=pos.min(0).tolist(), max=pos.max(0).tolist())
    a_idx = add(tris, ctype=5123, count=12, type_="SCALAR")
    a_joints = add(joints, ctype=5123, count=6, type_="VEC4")
    a_weights = add(weights, ctype=5126, count=6, type_="VEC4")
    a_ibm = add(np.frombuffer(ibm_bytes, np.float32), ctype=5126, count=2, type_="MAT4")
    a_times = add(times, ctype=5126, count=2, type_="SCALAR", min=[0.0], max=[1.0])
    a_rots = add(rots, ctype=5126, count=2, type_="VEC4")

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "skin": 0, "children": [1]},
            {"children": [2]},  # joint 0 at origin
            {"translation": [0, 1, 0]},  # joint 1
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": a_ibm}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": a_pos,
                            "JOINTS_0": a_joints,
                            "WEIGHTS_0": a_weights,
                        },
                        "indices": a_idx,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {"baseColorFactor": [0, 1, 0, 1]},
                "extensions": {"KHR_materials_unlit": {}},
                "doubleSided": True,
            }
        ],
        "extensionsUsed": ["KHR_materials_unlit"],
        "animations": [
            {
                "samplers": [
                    {"input": a_times, "interpolation": "LINEAR", "output": a_rots}
                ],
                "channels": [
                    {"sampler": 0, "target": {"node": 2, "path": "rotation"}}
                ],
            }
        ],
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{"byteLength": len(blob)}],
    }
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(blob))
    out += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    out += struct.pack("<II", len(blob), 0x004E4942) + blob
    return out


@pytest.fixture
def skinned_glb():
    return make_skinned_glb()
