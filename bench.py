#!/usr/bin/env python3
"""Benchmark: FPS at 1920x1080 rendering the PBR+IBL north-star scene.

BASELINE.json target: >= 60 FPS on one TPU v5e chip rendering DamagedHelmet
with PBR + IBL. DamagedHelmet.glb is not present in this environment, so
the scene is a procedural stand-in with the same workload shape: a
15,488-triangle UV sphere (helmet: 15,452) with albedo/normal/metallic-
roughness textures, SH ambient lighting, and an IBL skybox — the full
fragment pipeline (visibility raster, deferred PBR, normal mapping,
trilinear texture sampling, skybox, ACES tonemap).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)

import numpy as np


def main():
    import jax

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import superconductor_tpu as sc
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
        gradient_cubemap,
    )

    width, height = 1920, 1080
    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    cubemap_base = gradient_cubemap(scene)

    from superconductor_tpu.math3d import look_at, mat4_inverse, mat3_to_quat

    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    v = look_at(cam.position, [0, 0, 0])
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uniforms = sc.make_uniforms(cam, width, height)

    env = sc.EnvBindings(
        ibl_cubemap_base=cubemap_base, ambient_sh=default_ambient_sh()
    )
    config = sc.RenderConfig(
        width=width,
        height=height,
        t_cap=1 << 15,
        t_cap_anim=1 << 6,
        p_cap=1 << 17,
        raster="auto",
    )

    dev = scene.device_arrays()

    def frame(angle: float):
        from superconductor_tpu.math3d import quat_from_axis_angle

        sim = sc.Similarity(rotation=quat_from_axis_angle([0, 1, 0], angle))
        state = build_frame_state(scene, [(model, sim)], uniforms)
        return sc.render_frame(dev, state, config, env)

    # Warmup / compile.
    t0 = time.time()
    img = frame(0.0)
    img.block_until_ready()
    compile_s = time.time() - t0

    for i in range(3):
        frame(0.1 * i).block_until_ready()

    n = 60
    t0 = time.time()
    for i in range(n):
        img = frame(0.01 * i)
    img.block_until_ready()
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    if os.environ.get("SC_BENCH_SAVE"):
        import imageio.v3 as iio

        iio.imwrite(os.environ["SC_BENCH_SAVE"], np.asarray(img)[0])

    print(
        json.dumps(
            {
                "metric": "FPS 1920x1080 PBR+IBL 15.5k-tri scene (TPU v5e)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )
    print(
        f"# backend={jax.default_backend()} compile={compile_s:.1f}s "
        f"frame={dt * 1000:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
