#!/usr/bin/env python3
"""Author tests/fixtures/dense_terrain.glb — a dense, textured, multi-LOD,
meshopt-compressed asset built with the repo's OWN encoders.

Purpose (VERDICT r2 #7): the only real authored scene in this environment
is sponza_cubes.glb (1.4k triangles); Sponza.bin is absent. This fixture
gives the bench and tests a real asset that exercises the ENTIRE loading
path at production scale — EXT_meshopt_compression decode (vertex +
triangle codecs), MSFT_lod + MSFT_screencoverage chains, embedded PNG
textures, normal mapping — the same path demo/src/lib.rs:57-193 feeds the
reference.

Content: a displaced terrain sheet (deterministic seeded sine/noise
displacement), three LODs (~113k / ~28k / ~7k triangles), one PBR material
with checker-noise albedo (512^2 PNG) and a bump-derived normal map
(256^2 PNG).

Deterministic: re-running reproduces the file byte-for-byte (seeded RNG,
fixed PNG encoder settings).
"""

import io
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superconductor_tpu.assets import meshopt


def terrain_height(x, z):
    """Deterministic displacement field (x, z in [0,1])."""
    h = (
        0.35 * np.sin(5.1 * 2 * np.pi * x) * np.cos(3.7 * 2 * np.pi * z)
        + 0.22 * np.sin(11.3 * 2 * np.pi * x + 1.3) * np.sin(9.1 * 2 * np.pi * z + 0.4)
        + 0.11 * np.cos(23.0 * 2 * np.pi * x + 2.1) * np.cos(19.0 * 2 * np.pi * z + 1.7)
        + 0.05 * np.sin(41.0 * 2 * np.pi * x + 0.9) * np.cos(37.0 * 2 * np.pi * z + 2.6)
    )
    return h.astype(np.float32)


def make_grid(nx, nz, extent=8.0, amp=1.0):
    """-> positions (V,3) f32, normals (V,3) f32, uvs (V,2) f32, idx (I,) u32."""
    xs = np.linspace(0.0, 1.0, nx, dtype=np.float32)
    zs = np.linspace(0.0, 1.0, nz, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")  # (nx, nz)
    gy = amp * terrain_height(gx, gz)
    pos = np.stack(
        [(gx - 0.5) * extent, gy, (gz - 0.5) * extent], axis=-1
    ).reshape(-1, 3)

    # analytic-ish normals via central differences of the height field
    eps = 1e-3
    dhdx = (terrain_height(gx + eps, gz) - terrain_height(gx - eps, gz)) / (2 * eps)
    dhdz = (terrain_height(gx, gz + eps) - terrain_height(gx, gz - eps)) / (2 * eps)
    # world-space slope: dy/dworldx = amp * dh/dx / extent
    n = np.stack(
        [-amp * dhdx / extent, np.ones_like(gx), -amp * dhdz / extent], axis=-1
    )
    n = (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)
    nrm = n.reshape(-1, 3)

    uv = np.stack([gx * 6.0, gz * 6.0], axis=-1).reshape(-1, 2).astype(np.float32)

    i = np.arange(nx - 1)[:, None]
    j = np.arange(nz - 1)[None, :]
    v00 = (i * nz + j).astype(np.uint32)
    v01 = v00 + 1
    v10 = v00 + np.uint32(nz)
    v11 = v10 + 1
    tris = np.stack(
        [v00, v01, v11, v00, v11, v10], axis=-1
    ).reshape(-1, 3)  # CCW for +y-up viewed from above
    return pos, nrm, uv.astype(np.float32), tris.reshape(-1).astype(np.uint32)


def make_textures():
    rng = np.random.default_rng(42)
    s = 512
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    checker = (((xx * 12).astype(int) + (yy * 12).astype(int)) % 2).astype(np.float32)
    noise = rng.uniform(0.0, 1.0, (64, 64)).astype(np.float32)
    noise = np.kron(noise, np.ones((8, 8), np.float32))  # blocky detail
    base = 0.25 + 0.5 * checker
    r = np.clip(base * (0.8 + 0.3 * noise), 0, 1)
    g = np.clip(base * (0.7 + 0.2 * noise), 0, 1)
    b = np.clip(0.35 + 0.25 * noise, 0, 1)
    albedo = np.stack(
        [r, g, b, np.ones_like(r)], axis=-1
    )
    albedo8 = (albedo * 255 + 0.5).astype(np.uint8)

    # normal map from a bump field (finite differences)
    sn = 256
    ynn, xnn = np.mgrid[0:sn, 0:sn].astype(np.float32) / sn
    bump = 0.5 * np.sin(16 * 2 * np.pi * xnn) * np.cos(14 * 2 * np.pi * ynn)
    dx = np.roll(bump, -1, 1) - np.roll(bump, 1, 1)
    dy = np.roll(bump, -1, 0) - np.roll(bump, 1, 0)
    nx, ny, nz = -dx * 4, -dy * 4, np.ones_like(bump)
    ln = np.sqrt(nx * nx + ny * ny + nz * nz)
    nmap = np.stack(
        [nx / ln, ny / ln, nz / ln, np.ones_like(bump)], axis=-1
    )
    nmap8 = ((nmap * 0.5 + 0.5) * 255 + 0.5).astype(np.uint8)
    nmap8[..., 3] = 255
    return albedo8, nmap8


def png_bytes(img8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img8, "RGBA").save(buf, format="PNG", optimize=False)
    return buf.getvalue()


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "dense_terrain.glb",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    lods = [make_grid(240, 240), make_grid(120, 120), make_grid(60, 60)]

    bin_parts = []
    views = []
    accessors = []
    offset = 0

    def add_meshopt_view(raw_u8, count, stride, mode, pad_to=4):
        nonlocal offset
        if mode == "ATTRIBUTES":
            comp = meshopt.encode_vertex_buffer(raw_u8.reshape(count, stride))
        else:
            comp = meshopt.encode_index_buffer(
                raw_u8.view(np.uint32)
            )
        # byteLength must be the EXACT stream length: the vertex codec
        # keeps its baseline vertex in the trailing bytes, so padding goes
        # after the view, never inside it.
        stored = len(comp)
        pad = b"\0" * (-stored % pad_to)
        view = {
            "buffer": 0,
            "byteOffset": offset,
            "byteLength": stored,
            "extensions": {
                "EXT_meshopt_compression": {
                    "buffer": 0,
                    "byteOffset": offset,
                    "byteLength": stored,
                    "count": count,
                    "byteStride": stride,
                    "mode": mode,
                }
            },
        }
        if mode == "ATTRIBUTES":
            view["byteStride"] = stride
        bin_parts.append(comp + pad)
        views.append(view)
        offset += stored + len(pad)
        return len(views) - 1

    def add_raw_view(raw_bytes, pad_to=4):
        nonlocal offset
        raw_bytes += b"\0" * (-len(raw_bytes) % pad_to)
        views.append(
            {"buffer": 0, "byteOffset": offset, "byteLength": len(raw_bytes)}
        )
        bin_parts.append(raw_bytes)
        offset += len(raw_bytes)
        return len(views) - 1

    meshes = []
    for pos, nrm, uv, idx in lods:
        vcount = len(pos)
        attr_ids = {}
        for name, arr, ctype, atype in (
            ("POSITION", pos, 5126, "VEC3"),
            ("NORMAL", nrm, 5126, "VEC3"),
            ("TEXCOORD_0", uv, 5126, "VEC2"),
        ):
            stride = arr.shape[1] * 4
            vi = add_meshopt_view(
                np.ascontiguousarray(arr).view(np.uint8).reshape(vcount, stride),
                vcount, stride, "ATTRIBUTES",
            )
            acc = {
                "bufferView": vi,
                "componentType": ctype,
                "count": vcount,
                "type": atype,
            }
            if name == "POSITION":
                acc["min"] = pos.min(0).tolist()
                acc["max"] = pos.max(0).tolist()
            accessors.append(acc)
            attr_ids[name] = len(accessors) - 1
        vi = add_meshopt_view(
            np.ascontiguousarray(idx).view(np.uint8), len(idx), 4, "TRIANGLES"
        )
        accessors.append(
            {"bufferView": vi, "componentType": 5125, "count": len(idx),
             "type": "SCALAR"}
        )
        meshes.append(
            {
                "primitives": [
                    {
                        "attributes": attr_ids,
                        "indices": len(accessors) - 1,
                        "material": 0,
                    }
                ]
            }
        )

    albedo8, nmap8 = make_textures()
    alb_view = add_raw_view(png_bytes(albedo8))
    nrm_view = add_raw_view(png_bytes(nmap8))

    doc = {
        "asset": {"version": "2.0", "generator": "superconductor-tpu fixture"},
        "extensionsUsed": ["EXT_meshopt_compression", "MSFT_lod"],
        "extensionsRequired": ["EXT_meshopt_compression"],
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {
                "mesh": 0,
                "extensions": {"MSFT_lod": {"ids": [1, 2]}},
                "extras": {"MSFT_screencoverage": [0.6, 0.2, 0.05]},
            },
            {"mesh": 1},
            {"mesh": 2},
        ],
        "meshes": meshes,
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.85,
                },
                "normalTexture": {"index": 1},
            }
        ],
        "textures": [{"source": 0, "sampler": 0}, {"source": 1, "sampler": 0}],
        "samplers": [{"wrapS": 10497, "wrapT": 10497}],
        "images": [
            {"bufferView": alb_view, "mimeType": "image/png"},
            {"bufferView": nrm_view, "mimeType": "image/png"},
        ],
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{"byteLength": offset}],
    }

    json_bytes = json.dumps(doc, separators=(",", ":")).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    bin_data = b"".join(bin_parts)
    bin_data += b"\0" * (-len(bin_data) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_data)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942) + bin_data)

    tri_counts = [len(l[3]) // 3 for l in lods]
    print(f"wrote {out_path}: {os.path.getsize(out_path)} bytes, "
          f"LOD tris {tri_counts}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
