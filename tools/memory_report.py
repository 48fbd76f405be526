#!/usr/bin/env python3
"""HBM residency at scale: pool bytes vs source bytes, and what fits.

Runs entirely on host (the report reads host-side pool accounting), so
it works with the TPU tunnel down. Three scenarios:

  1. headline scene (procedural sphere + gradient cubemap)
  2. all-passes bench scene (dense_terrain + sponza_cubes + lightvol +
     noon IBL + smoke)
  3. scenario 2 + the full Sponza JPEG/PNG texture set (the largest
     authored texture load available in this environment, ~43 MB wire)
     at max_texture_size in {None, 1024, 512}

plus the budget knob demonstrated on scenario 3 (2 GB budget -> quad
pools dropped). Output: one JSON line per scenario for docs/MEMORY.md.

Usage: python tools/memory_report.py [--skip-sponza]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

SPONZA = "/root/reference/demo/web/assets/models/Sponza/glTF"


def geometry_bytes(scene):
    total = 0
    for name in ("positions", "normals", "uvs", "lightmap_uvs", "indices",
                 "tri_material", "anim_positions", "anim_normals",
                 "anim_uvs", "anim_joint_indices", "anim_joint_weights",
                 "anim_indices", "anim_tri_material"):
        arr = getattr(scene, name)
        a = arr.array if hasattr(arr, "array") else arr
        total += a.capacity * a.host.dtype.itemsize * (
            a.host.shape[1] if a.host.ndim > 1 else 1
        )
    return total


def summarize(tag, scene, extra=None):
    rep = scene.texture_memory_report()
    gb = geometry_bytes(scene)
    out = {
        "scenario": tag,
        "texture_device_mb": round(rep["total_device_bytes"] / 1e6, 1),
        "ldr_used_mb": round(rep["ldr"]["texel_bytes_used"] / 1e6, 1),
        "hdr_used_mb": round(rep["hdr"]["texel_bytes_used"] / 1e6, 1),
        "sh_pool_mb": round(rep["sh_pool_bytes"] / 1e6, 1),
        "source_mb": round(
            (rep["ldr"]["source_bytes"] + rep["hdr"]["source_bytes"]) / 1e6,
            1,
        ),
        "geometry_mb": round(gb / 1e6, 1),
        "total_mb": round((rep["total_device_bytes"] + gb) / 1e6, 1),
        "quad_pools": scene.quad_pools,
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return out


def build_all_passes_scene(sc, max_texture_size=None):
    """The all-passes bench content loaded into an inspectable Scene
    (bench.all_passes_scene keeps its Scene internal)."""
    from superconductor_tpu.assets.environment import (
        load_ibl_cubemap,
        load_lightvol,
        load_smoke_textures,
    )
    from superconductor_tpu.assets.models import load_model

    REF = "/root/reference/demo/web/assets"
    scene = sc.Scene()
    scene.max_texture_size = max_texture_size
    load_model(scene, open(f"{REF}/models/sponza_cubes.glb", "rb").read(),
               name="sponza_cubes")
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "tests", "fixtures", "dense_terrain.glb")
    load_model(scene, open(fixture, "rb").read(), name="dense_terrain")
    lv = f"{REF}/lighting/bcn"
    load_lightvol(
        scene,
        open(f"{lv}/lightvol.ktx2", "rb").read(),
        open(f"{lv}/lightvol_x.ktx2", "rb").read(),
        open(f"{lv}/lightvol_y.ktx2", "rb").read(),
        open(f"{lv}/lightvol_z.ktx2", "rb").read(),
        bottom_left=(-12.0, 0.0, -6.0), scale=(24.0, 12.0, 12.0),
    )
    load_ibl_cubemap(scene, open(f"{REF}/cubemaps/noon.ktx2", "rb").read())
    load_smoke_textures(
        scene,
        open(f"{REF}/smoke/burst/TX_Pyro_AerialBurst_P.tga.ktx2", "rb").read(),
        open(f"{REF}/smoke/burst/TX_Pyro_AerialBurst_N.tga.ktx2", "rb").read(),
        open(f"{REF}/smoke/lut.ktx2", "rb").read(),
    )
    return scene


def add_sponza_textures(scene):
    """Load the full Sponza texture set (the biggest authored texture
    load on this box) through the standard mip-chain path."""
    from PIL import Image
    import numpy as np

    from superconductor_tpu.scene.scene import (
        TEXFLAG_SRGB,
        build_mip_chain,
        mip_skip_for_max_size,
    )

    n = 0
    for p in sorted(glob.glob(f"{SPONZA}/*.jpg") + glob.glob(f"{SPONZA}/*.png")):
        img = np.asarray(Image.open(p).convert("RGBA"))
        skip = mip_skip_for_max_size(
            img.shape[0], img.shape[1], scene.max_texture_size
        )
        chain = build_mip_chain(img)[skip:]
        scene.textures.add_texture(chain, flags=TEXFLAG_SRGB)
        scene.textures.source_bytes += os.path.getsize(p)
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sponza", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench  # noqa: F401  (REF_ASSETS path check)
    import superconductor_tpu as sc
    from superconductor_tpu.utils.procgen import add_pbr_sphere, gradient_cubemap

    s = sc.Scene()
    add_pbr_sphere(s)
    gradient_cubemap(s)
    summarize("headline (procedural)", s)

    s2 = build_all_passes_scene(sc)
    summarize("all-passes bench scene", s2)

    if not args.skip_sponza and os.path.isdir(SPONZA):
        for max_size in (None, 1024, 512):
            s3 = build_all_passes_scene(sc, max_texture_size=max_size)
            n = add_sponza_textures(s3)
            summarize(
                f"all-passes + full Sponza texture set "
                f"(max_size={max_size})",
                s3, {"sponza_textures": n},
            )
        # budget knob at scale: 2 GB forces the quad drop
        s4 = build_all_passes_scene(sc)
        add_sponza_textures(s4)
        s4.texture_budget_bytes = 2 << 30
        s4.enforce_texture_budget()
        summarize("   + 2 GB budget enforced", s4,
                  {"budget_gb": 2, "degrade": dict(s4._budget_state)})


if __name__ == "__main__":
    main()
