#!/usr/bin/env python3
"""Author tests/fixtures/hero_helmet.glb — the DamagedHelmet-class headline
asset, built entirely with the repo's OWN encoders (VERDICT r3 #6).

BASELINE.json's north star names DamagedHelmet (PBR + IBL at 1080p), which
is not present in this environment and cannot be fetched (egress probe
2026-08-19: DNS fails for all hosts). This authors an equivalent-class
asset in-repo so the bench headline exercises the FULL asset pipeline —
GLB parse, EXT_meshopt_compression vertex+index decode, MSFT_lod chains,
KHR_texture_basisu KTX2 textures (BasisLZ/ETC1S supercompression through
the native transcoder) plus a zstd-less uncompressed-RGBA8 KTX2 normal
map, multi-material PBR with emissive — the same path the reference feeds
from its demo assets (renderer-core/src/assets/textures.rs:929-1097,
models.rs).

Content: a sci-fi helmet — an elongated dome with surface ridge bands and
a flattened neck rim, a front faceplate cut as a SECOND material with an
emissive visor stripe. Three LODs (~15.5k / ~3.8k / ~0.9k tris — LOD0
matches DamagedHelmet's 15.4k). Uniform 512² texture set (DamagedHelmet
ships all four slots at one size, 2048²): albedo ETC1S (sRGB, full mip
chain), metallic-roughness ETC1S (linear), emissive ETC1S (sRGB),
normal map RGBA8 KTX2 (linear, full mip chain).

Deterministic: re-running reproduces the file byte-for-byte.
"""

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superconductor_tpu.assets import meshopt
from superconductor_tpu.assets.basislz import write_etc1s_ktx2


# ---------------------------------------------------------------- geometry

def _radius(theta, phi):
    """Helmet profile: unit dome radius modulated by ridge bands and a
    slight front/back elongation. theta: azimuth [0, 2pi), phi: polar
    [0 (top), phi_max (neck)]."""
    r = 1.0
    # elongate front-to-back, narrow side-to-side (skull shape)
    r = r * (1.0 + 0.10 * np.cos(theta) ** 2 - 0.06 * np.sin(theta) ** 2)
    # horizontal ridge bands over the crown
    r = r + 0.015 * np.sin(9.0 * phi) * np.clip(np.sin(phi) * 2.0, 0, 1)
    # vertical rib accents at the back
    back = 0.5 * (1.0 - np.cos(theta))  # 1 at theta=pi (back)
    r = r + 0.010 * back * np.sin(12.0 * theta) * np.sin(phi) ** 2
    # neck rim flare at the bottom edge
    r = r + 0.05 * np.clip((phi - 2.15) / 0.35, 0.0, 1.0) ** 2
    return r


PHI_MAX = 2.5  # ~143 degrees: open at the bottom like a helmet


def _surface(theta, phi):
    r = _radius(theta, phi)
    x = r * np.sin(phi) * np.sin(theta)
    y = r * np.cos(phi) * 1.15  # taller than wide
    z = r * np.sin(phi) * np.cos(theta)  # +z faces the camera (front)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def make_lod(n_theta, n_phi):
    """-> positions (V,3), normals (V,3), uvs (V,2), tris (T,3) u32.

    Lat-long grid with a duplicated seam column so uvs wrap cleanly."""
    thetas = np.linspace(0.0, 2 * np.pi, n_theta + 1, dtype=np.float64)
    phis = np.linspace(1e-3, PHI_MAX, n_phi, dtype=np.float64)
    gt, gp = np.meshgrid(thetas, phis, indexing="ij")  # (n_theta+1, n_phi)
    pos = _surface(gt, gp).reshape(-1, 3)

    # normals by central differences on the parametric surface
    eps = 1e-4
    du = _surface(gt + eps, gp) - _surface(gt - eps, gp)
    dv = _surface(gt, gp + eps) - _surface(gt, gp - eps)
    n = np.cross(dv.reshape(-1, 3), du.reshape(-1, 3))
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    nrm = (n / np.maximum(ln, 1e-12)).astype(np.float32)

    uv = np.stack([gt / (2 * np.pi), gp / PHI_MAX], axis=-1)
    uv = uv.reshape(-1, 2).astype(np.float32)

    i = np.arange(n_theta)[:, None]
    j = np.arange(n_phi - 1)[None, :]
    v00 = (i * n_phi + j).astype(np.uint32)
    v01 = v00 + 1
    v10 = v00 + np.uint32(n_phi)
    v11 = v10 + 1
    tris = np.stack([v00, v01, v11, v00, v11, v10], axis=-1).reshape(-1, 3)
    return pos, nrm, uv, tris


def faceplate_mask(pos, tris):
    """Per-triangle bool: centroid in the front visor region."""
    c = pos[tris].mean(axis=1)
    theta = np.arctan2(c[:, 0], c[:, 2])  # 0 at +z (front)
    # polar angle from the stretched y
    r = np.linalg.norm(c, axis=1)
    phi = np.arccos(np.clip(c[:, 1] / (1.15 * np.maximum(r / 1.1, 1e-6)), -1, 1))
    return (np.abs(theta) < 0.55) & (phi > 0.9) & (phi < 1.9)


# ---------------------------------------------------------------- textures

def mip_chain(img8):
    mips = [img8]
    while mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1:
        p = mips[-1].astype(np.float32)
        mh, mw = max(1, p.shape[0] // 2), max(1, p.shape[1] // 2)
        m = p[: mh * 2, : mw * 2].reshape(mh, 2, mw, 2, 4).mean((1, 3))
        mips.append(np.clip(np.rint(m), 0, 255).astype(np.uint8))
    return mips


def make_rgba8_ktx2(levels):
    """Minimal uncompressed RGBA8 KTX2 (same layout the lifecycle tests
    pin); levels finest-first."""
    magic = b"\xabKTX 20\xbb\r\n\x1a\n"
    n = len(levels)
    h0, w0 = levels[0].shape[:2]
    header = struct.pack("<9I", 37, 1, w0, h0, 0, 0, 1, n, 0)
    dfd_kvd_sgd = struct.pack("<4I2Q", 0, 0, 0, 0, 0, 0)
    index_off = 12 + 48 + 20 + n * 24
    offsets = []
    payloads = b""
    for lvl in reversed(levels):
        b = lvl.tobytes()
        offsets.append((index_off + len(payloads), len(b), len(b)))
        payloads += b
    offsets = offsets[::-1]
    index = b"".join(struct.pack("<3Q", *o) for o in offsets)
    return magic + header + dfd_kvd_sgd + index + payloads


def make_textures():
    rng = np.random.default_rng(7)
    s = 512
    v, u = np.mgrid[0:s, 0:s].astype(np.float64) / s  # v = phi axis

    # -- albedo: brushed dark teal with panel lines and wear noise
    panel = ((u * 8).astype(int) + (v * 5).astype(int)) % 2
    brush = 0.5 + 0.5 * np.sin(u * 640.0 + 3.0 * np.sin(v * 40.0))
    noise = rng.uniform(0, 1, (64, 64))
    noise = np.kron(noise, np.ones((8, 8)))
    base = 0.18 + 0.08 * panel + 0.05 * brush
    r = base * (0.9 + 0.2 * noise)
    g = base * (1.15 + 0.15 * noise)
    b = base * (1.35 + 0.1 * noise)
    # visor stripe region painted darker (the faceplate material overlays
    # emissive there); the faceplate spans |theta| < 0.55 at the FRONT,
    # i.e. u = theta/2pi in [0, 0.088) + (0.912, 1] (wrapping)
    stripe = (np.abs(v - 0.55) < 0.06) & ((u < 0.088) | (u > 0.912))
    r = np.where(stripe, 0.02, r)
    g = np.where(stripe, 0.02, g)
    b = np.where(stripe, 0.03, b)
    albedo8 = np.stack(
        [np.clip(c, 0, 1) * 255 + 0.5 for c in (r, g, b, np.ones_like(r))],
        axis=-1,
    ).astype(np.uint8)

    # -- normal map: panel-line grooves + rivets
    bump = 0.3 * np.cos(u * 2 * np.pi * 8) ** 64 + 0.3 * np.cos(
        v * 2 * np.pi * 5
    ) ** 64
    riv_u = (u * 32) % 1.0 - 0.5
    riv_v = (v * 20) % 1.0 - 0.5
    rivet = np.exp(-(riv_u**2 + riv_v**2) * 300.0) * 0.5
    field = bump - rivet
    dx = np.roll(field, -1, 1) - np.roll(field, 1, 1)
    dy = np.roll(field, -1, 0) - np.roll(field, 1, 0)
    nx, ny, nz = -dx * 6, -dy * 6, np.ones_like(field)
    ln = np.sqrt(nx * nx + ny * ny + nz * nz)
    nmap8 = np.stack(
        [
            ((nx / ln) * 0.5 + 0.5) * 255 + 0.5,
            ((ny / ln) * 0.5 + 0.5) * 255 + 0.5,
            ((nz / ln) * 0.5 + 0.5) * 255 + 0.5,
            np.full_like(field, 255.0),
        ],
        axis=-1,
    ).astype(np.uint8)

    # -- metallic-roughness (B = metallic, G = roughness per glTF).
    # Same size as the albedo/normal maps: real DamagedHelmet-class assets
    # ship a uniform texture set (DamagedHelmet itself is 2048^2 across all
    # slots), and the equal-dims set also exercises the interleaved
    # material pool (Scene.device_matq) on the headline scene.
    sm = 512
    vm, um = np.mgrid[0:sm, 0:sm].astype(np.float64) / sm
    rough = 0.35 + 0.4 * (((um * 8).astype(int) + (vm * 5).astype(int)) % 2)
    rough = np.clip(rough + rng.uniform(-0.05, 0.05, (sm, sm)), 0.05, 1.0)
    metal = np.full((sm, sm), 0.9)
    mr8 = np.stack(
        [
            np.zeros((sm, sm)),
            rough * 255 + 0.5,
            metal * 255 + 0.5,
            np.full((sm, sm), 255.0),
        ],
        axis=-1,
    ).astype(np.uint8)

    # -- emissive: the visor glow stripe (only the faceplate material
    # binds this)
    ve, ue = np.mgrid[0:sm, 0:sm].astype(np.float64) / sm
    # same wrapping u-band as the albedo stripe (the faceplate's UV range)
    glow = np.exp(-(((ve - 0.55) / 0.035) ** 2)) * ((ue < 0.088) | (ue > 0.912))
    em8 = np.stack(
        [
            np.clip(glow * 0.9, 0, 1) * 255 + 0.5,
            np.clip(glow * 0.5, 0, 1) * 255 + 0.5,
            np.clip(glow * 0.1, 0, 1) * 255 + 0.5,
            np.full((sm, sm), 255.0),
        ],
        axis=-1,
    ).astype(np.uint8)

    return albedo8, nmap8, mr8, em8


# ---------------------------------------------------------------- container

def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hero_helmet.glb",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    lods = [make_lod(110, 74), make_lod(55, 37), make_lod(27, 18)]

    bin_parts = []
    views = []
    accessors = []
    offset = 0

    def add_meshopt_view(raw_u8, count, stride, mode, pad_to=4):
        nonlocal offset
        if mode == "ATTRIBUTES":
            comp = meshopt.encode_vertex_buffer(raw_u8.reshape(count, stride))
        else:
            comp = meshopt.encode_index_buffer(raw_u8.view(np.uint32))
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
    tri_counts = []
    for pos, nrm, uv, tris in lods:
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

        mask = faceplate_mask(pos, tris)
        prims = []
        for mat_index, sel in ((0, ~mask), (1, mask)):
            idx = np.ascontiguousarray(tris[sel].reshape(-1)).astype(np.uint32)
            if len(idx) == 0:
                continue
            vi = add_meshopt_view(idx.view(np.uint8), len(idx), 4, "TRIANGLES")
            accessors.append(
                {"bufferView": vi, "componentType": 5125, "count": len(idx),
                 "type": "SCALAR"}
            )
            prims.append(
                {"attributes": attr_ids, "indices": len(accessors) - 1,
                 "material": mat_index}
            )
        meshes.append({"primitives": prims})
        tri_counts.append(len(tris))

    albedo8, nmap8, mr8, em8 = make_textures()
    # KTX2 payloads: ETC1S with full mip chains through the repo's own
    # BasisLZ encoder; normal map as uncompressed-RGBA8 KTX2 (ETC1S's
    # 4x4 single-pair quantization is too coarse for normals, matching
    # the reference's UASTC-for-normals transcode priority,
    # textures.rs:1099-1153)
    n_lv = lambda im: int(np.log2(max(im.shape[0], im.shape[1]))) + 1  # noqa: E731
    alb_ktx = write_etc1s_ktx2(
        albedo8, num_levels=n_lv(albedo8), srgb=True,
        history_size=64, use_rle=True,
    )
    mr_ktx = write_etc1s_ktx2(
        mr8, num_levels=n_lv(mr8), srgb=False, history_size=64, use_rle=True
    )
    em_ktx = write_etc1s_ktx2(
        em8, num_levels=n_lv(em8), srgb=True, history_size=64, use_rle=True
    )
    nrm_ktx = make_rgba8_ktx2(mip_chain(nmap8))

    img_views = [
        add_raw_view(alb_ktx),
        add_raw_view(nrm_ktx),
        add_raw_view(mr_ktx),
        add_raw_view(em_ktx),
    ]

    doc = {
        "asset": {"version": "2.0", "generator": "superconductor-tpu fixture"},
        "extensionsUsed": [
            "EXT_meshopt_compression", "MSFT_lod", "KHR_texture_basisu",
        ],
        "extensionsRequired": ["EXT_meshopt_compression"],
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {
                "mesh": 0,
                "extensions": {"MSFT_lod": {"ids": [1, 2]}},
                "extras": {"MSFT_screencoverage": [0.5, 0.15, 0.03]},
            },
            {"mesh": 1},
            {"mesh": 2},
        ],
        "meshes": meshes,
        "materials": [
            {
                "name": "shell",
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicRoughnessTexture": {"index": 2},
                },
                "normalTexture": {"index": 1},
            },
            {
                "name": "faceplate",
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicRoughnessTexture": {"index": 2},
                },
                "normalTexture": {"index": 1},
                "emissiveTexture": {"index": 3},
                "emissiveFactor": [1.0, 1.0, 1.0],
                "extensions": {
                    "KHR_materials_emissive_strength": {
                        "emissiveStrength": 4.0
                    }
                },
            },
        ],
        "textures": [
            {"extensions": {"KHR_texture_basisu": {"source": 0}},
             "sampler": 0},
            {"extensions": {"KHR_texture_basisu": {"source": 1}},
             "sampler": 0},
            {"extensions": {"KHR_texture_basisu": {"source": 2}},
             "sampler": 0},
            {"extensions": {"KHR_texture_basisu": {"source": 3}},
             "sampler": 0},
        ],
        "samplers": [{"wrapS": 10497, "wrapT": 10497}],
        "images": [
            {"bufferView": img_views[0], "mimeType": "image/ktx2"},
            {"bufferView": img_views[1], "mimeType": "image/ktx2"},
            {"bufferView": img_views[2], "mimeType": "image/ktx2"},
            {"bufferView": img_views[3], "mimeType": "image/ktx2"},
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

    print(
        f"wrote {out_path}: {os.path.getsize(out_path)} bytes, "
        f"LOD tris {tri_counts}, ktx2 bytes "
        f"{[len(alb_ktx), len(nrm_ktx), len(mr_ktx), len(em_ktx)]}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
