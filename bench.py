#!/usr/bin/env python3
"""Benchmark: FPS at 1920x1080 on one TPU chip.

Two configurations:

1. **Headline (primary metric)** — the PBR+IBL north-star scene.
   BASELINE.json target: >= 60 FPS rendering DamagedHelmet with PBR + IBL.
   DamagedHelmet.glb is not present in this environment, so the scene is a
   procedural stand-in with the same workload shape: a 15,488-triangle UV
   sphere (helmet: 15,452) with albedo/normal/metallic-roughness textures,
   SH ambient lighting, and an IBL skybox.

3. **Stereo + animated** — BASELINE configs 4+5: two 1080p eyes (multiview
   batch axis), skinned waving tubes (joint-palette path, FK sampled on the
   host every frame) + PBR spheres.

2. **All-passes** — every pass enabled at 1080p on real compressed assets:
   sponza_cubes.glb + the BC6H/BCn light volume + the noon.ktx2 IBL
   (demo/src/lib.rs:114-192's scene config), with the triangle load
   carried by the committed dense_terrain.glb fixture (114k-tri LOD0,
   meshopt-compressed, multi-LOD, textured) + 8 procedural spheres for
   alpha-clipped and alpha-blended materials (~240k tris total; full
   Sponza's 262k — Sponza.bin is absent from this checkout), debug lines,
   and smoke particles: opaque -> clip -> lines -> skybox -> particles ->
   blend -> tonemap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
primary, with the all-passes numbers as extra keys.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)

import numpy as np

REF_ASSETS = "/root/reference/demo/web/assets"


def _aim(cam, target, look_at, mat4_inverse, mat3_to_quat):
    v = look_at(cam.position, target)
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])


def _measure(frame_fn, device_fn=None, n=40, windows=5, device_windows=16,
             device_n=200):
    """Returns {"fps", "compile_s", "img", "device_ms", "device_spread"}.

    fps: median FPS over `windows` timing windows of `n` frames each,
    including per-frame host draw-build work — the end-to-end number. The
    axon tunnel adds multi-ms interference spikes, so a single window can
    under-report by 2x; the median absorbs most of it but r01->r02 showed
    ~30% residual drift, hence:

    device_ms: regression-proof steady-state frame time — `device_fn`
    replays ONE pre-built frame (no host draw-build, dispatches enqueue
    asynchronously, one sync per window) and the MIN over `device_windows`
    windows of `device_n` frames is reported. Interference can only
    inflate a window, never deflate it, so min-of-windows converges on the
    true pipelined device throughput and is comparable round over round.
    device_n is LONG (200): measured on this tunnel (2026-08-17), 40-frame
    windows still carry 2x dispatch-latency spikes, while 200-frame
    windows sit within ~6% of each other (min 0.172 / p50 0.183 ms on the
    headline scene). device_spread = (max-min)/min across windows, the
    run's own noise figure.
    """
    t0 = time.time()
    img = frame_fn(0.0)
    img.block_until_ready()
    compile_s = time.time() - t0
    for i in range(3):
        frame_fn(0.1 * (i + 1)).block_until_ready()
    rates = []
    for w in range(windows):
        t0 = time.time()
        for i in range(n):
            img = frame_fn(0.01 * i + w)
        img.block_until_ready()
        rates.append(n / (time.time() - t0))
    out = {
        "fps": float(np.median(rates)),
        "compile_s": compile_s,
        "img": img,
        "device_ms": None,
        "device_spread": None,
    }
    if device_fn is not None:
        device_fn().block_until_ready()  # same executable: cache-warm
        times = []
        for _ in range(device_windows):
            t0 = time.perf_counter()
            for _ in range(device_n):
                img2 = device_fn()
            img2.block_until_ready()
            times.append((time.perf_counter() - t0) / device_n)
        out["device_ms"] = min(times) * 1e3
        out["device_spread"] = (max(times) - min(times)) / min(times)
    return out


def bench_headline(sc, width=1920, height=1080):
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
        gradient_cubemap,
    )

    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    cubemap_base = gradient_cubemap(scene)
    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    _aim(cam, [0, 0, 0], look_at, mat4_inverse, mat3_to_quat)
    uniforms = sc.make_uniforms(cam, width, height)
    env = sc.EnvBindings(
        ibl_cubemap_base=cubemap_base, ambient_sh=default_ambient_sh()
    )
    config = sc.RenderConfig(
        width=width, height=height, t_cap=1 << 15, t_cap_anim=1 << 6,
        p_cap=1 << 17, raster="auto",
    )
    dev = scene.device_arrays()

    def frame(angle):
        sim = sc.Similarity(rotation=quat_from_axis_angle([0, 1, 0], angle))
        state = build_frame_state(scene, [(model, sim)], uniforms)
        return sc.render_frame(dev, state, config, env)

    state0 = build_frame_state(scene, [(model, sc.Similarity())], uniforms)
    return _measure(frame, lambda: sc.render_frame(dev, state0, config, env))


def bench_all_passes(sc, width=1920, height=1080, n_spheres=8):
    """Everything on, 1080p, real compressed assets + Sponza-scale load.

    The bulk triangle load is the committed dense_terrain.glb fixture
    (114k-tri LOD0, meshopt-compressed, multi-LOD, textured — authored by
    tools/make_dense_fixture.py), so the full asset path (meshopt decode ->
    mega-buffers -> LOD select -> texture sampling) carries the bench the
    way demo/src/lib.rs:57-193 feeds the reference; procedural spheres
    provide the alpha-clip/blend materials."""
    from superconductor_tpu.assets.environment import (
        load_ibl_cubemap,
        load_lightvol,
    )
    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.draws import (
        build_frame_state,
        pack_lines,
        pack_particles,
    )
    from superconductor_tpu.scene.scene import (
        BLEND_ALPHA_BLENDED,
        BLEND_ALPHA_CLIPPED,
    )
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    scene = sc.Scene()
    cubes = load_model(
        scene,
        open(f"{REF_ASSETS}/models/sponza_cubes.glb", "rb").read(),
        name="sponza_cubes",
    )
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "dense_terrain.glb",
    )
    terrain = load_model(
        scene, open(fixture, "rb").read(), name="dense_terrain"
    )
    lv = f"{REF_ASSETS}/lighting/bcn"
    load_lightvol(
        scene,
        open(f"{lv}/lightvol.ktx2", "rb").read(),
        open(f"{lv}/lightvol_x.ktx2", "rb").read(),
        open(f"{lv}/lightvol_y.ktx2", "rb").read(),
        open(f"{lv}/lightvol_z.ktx2", "rb").read(),
        # ProbesArrayInfo::new(center (0,6,0), scale (24,12,12)) of the
        # reference demo (demo/src/lib.rs:120-123): scale is the volume's
        # full world extent, so rescaled coords span [0,1] over the volume
        bottom_left=(-12.0, 0.0, -6.0),
        scale=(24.0, 12.0, 12.0),
    )
    load_ibl_cubemap(
        scene, open(f"{REF_ASSETS}/cubemaps/noon.ktx2", "rb").read()
    )
    from superconductor_tpu.assets.environment import load_smoke_textures

    smoke = f"{REF_ASSETS}/smoke"
    load_smoke_textures(
        scene,
        open(f"{smoke}/burst/TX_Pyro_AerialBurst_P.tga.ktx2", "rb").read(),
        open(f"{smoke}/burst/TX_Pyro_AerialBurst_N.tga.ktx2", "rb").read(),
        open(f"{smoke}/lut.ktx2", "rb").read(),
    )

    # Alpha-clip/blend materials: 8 PBR spheres (~15.5k tris each) around
    # the cube field; every 5th clipped, every 7th blended.
    spheres = []
    for i in range(n_spheres):
        m = add_pbr_sphere(scene, name=f"sphere{i}")
        mat = scene.materials[m.primitives[0].material]
        if i % 5 == 1:
            mat.blend_mode = BLEND_ALPHA_CLIPPED
            m.primitives[0].blend_mode = BLEND_ALPHA_CLIPPED
        elif i % 7 == 2:
            mat.blend_mode = BLEND_ALPHA_BLENDED
            mat.base_color_factor = (1.0, 1.0, 1.0, 0.6)
            m.primitives[0].blend_mode = BLEND_ALPHA_BLENDED
        spheres.append(m)
    scene._materials_dirty = True

    cam = sc.Camera(position=np.array([8.0, 2.5, 3.0], np.float32))
    _aim(cam, [0, 1.2, 0], look_at, mat4_inverse, mat3_to_quat)
    uniforms = sc.make_uniforms(cam, width, height)
    uniforms.probes_bottom_left = np.asarray(
        scene.lightvol["bottom_left"], np.float32
    )
    uniforms.probes_scale = np.asarray(scene.lightvol["scale"], np.float32)

    env = sc.EnvBindings.from_scene(scene)
    config = sc.RenderConfig(
        width=width, height=height, t_cap=1 << 18, t_cap_anim=1 << 6,
        p_cap=1 << 19, raster="auto",
        enable_clip=True, enable_blend=True,
        enable_lines=True, enable_particles=True,
    )
    dev = scene.device_arrays()

    lines = pack_lines(
        [[[g, 0.02, -5], [g, 0.02, 5]] for g in range(-5, 6)]
        + [[[-5, 0.02, g], [5, 0.02, g]] for g in range(-5, 6)],
        list(range(22)),
    )
    particles = pack_particles(
        [
            {
                "center": [
                    3.0 * np.cos(0.8 * k), 1.0 + 0.2 * k, 3.0 * np.sin(0.8 * k)
                ],
                "scale": [1.5, 1.5],
                "colour": [0.9, 0.9, 0.95],
                "emissive_colour": [0.3, 0.2, 0.1],
            }
            for k in range(16)
        ]
    )

    def build(angle):
        rot = quat_from_axis_angle([0, 1, 0], angle)
        instances = [
            (cubes, sc.Similarity()),
            # the dense authored asset carries the triangle load
            (terrain, sc.Similarity(translation=[0.0, -0.6, 0.0], scale=1.6)),
        ]
        for i, m in enumerate(spheres):
            a = 2.0 * np.pi * i / len(spheres)
            instances.append(
                (m, sc.Similarity(
                    translation=[6.0 * np.cos(a), 1.3, 3.0 * np.sin(a)],
                    rotation=rot,
                ))
            )
        return build_frame_state(
            scene, instances, uniforms, lines=lines, particles=particles
        )

    def frame(angle):
        return sc.render_frame(dev, build(angle), config, env)

    state0 = build(0.0)
    return _measure(frame, lambda: sc.render_frame(dev, state0, config, env))


def bench_stereo_animated(sc, width=1920, height=1080, n_tubes=6, n_spheres=6):
    """BASELINE configs 4+5 in one scene: stereo multiview (two 1080p eyes)
    of skinned animated geometry (waving 8-joint tubes, the animated_vertex
    joint-palette path) plus static PBR spheres. Per-frame host work includes
    the palette FK sampling, as the real app loop would."""
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.camera import make_stereo_uniforms
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        add_skinned_tube,
        default_ambient_sh,
        gradient_cubemap,
        wave_joint_palettes,
    )

    # ONE tube model and ONE sphere model, instanced n times with distinct
    # transforms/palettes — geometry and textures live once in the scene
    # (instanced rendering, the GpuInstance path of rendering.rs:642-646).
    scene = sc.Scene()
    tube = add_skinned_tube(scene, segments=64, slices=48, name="tube")
    sphere = add_pbr_sphere(scene, name="st_sphere")
    cubemap_base = gradient_cubemap(scene)
    env = sc.EnvBindings(
        ibl_cubemap_base=cubemap_base, ambient_sh=default_ambient_sh()
    )

    center = np.array([0.0, 1.0, 0.0], np.float32)
    eye_mid = np.array([0.0, 1.4, 7.0], np.float32)
    rot = mat3_to_quat(mat4_inverse(look_at(eye_mid, center))[:3, :3])
    half_ipd = np.array([0.032, 0.0, 0.0], np.float32)
    left = sc.Camera(position=eye_mid - half_ipd, rotation=rot)
    right = sc.Camera(position=eye_mid + half_ipd, rotation=rot)
    lu = sc.make_uniforms(left, width, height)
    ru = sc.make_uniforms(right, width, height)
    uniforms = make_stereo_uniforms(
        lu.view[0], ru.view[0], lu.projection[0], ru.projection[0],
        lu.eye[0], ru.eye[0], left.rotation, right.rotation,
    )

    config = sc.RenderConfig(
        width=width, height=height, num_views=2,
        t_cap=1 << 17, t_cap_anim=1 << 16, p_cap=1 << 19, raster="auto",
    )
    dev = scene.device_arrays()

    def frame(t):
        rot_i = quat_from_axis_angle([0, 1, 0], 0.3 * t)
        instances = []
        pals = wave_joint_palettes(
            t + 0.7 * np.arange(n_tubes, dtype=np.float32), 8, amp=0.45
        )
        palettes = {i: pals[i] for i in range(n_tubes)}
        for i in range(n_tubes):
            a = 2.0 * np.pi * i / n_tubes
            instances.append(
                (tube, sc.Similarity(
                    translation=[3.2 * np.cos(a), 0.0, 3.2 * np.sin(a)]
                ))
            )
        for i in range(n_spheres):
            a = 2.0 * np.pi * (i + 0.5) / n_spheres
            instances.append(
                (sphere, sc.Similarity(
                    translation=[5.5 * np.cos(a), 1.2, 5.5 * np.sin(a)],
                    rotation=rot_i,
                ))
            )
        state = build_frame_state(
            scene, instances, uniforms, joint_palettes=palettes
        )
        return sc.render_frame(dev, state, config, env)

    def build_fixed(t=0.0):
        instances = []
        pals = wave_joint_palettes(
            t + 0.7 * np.arange(n_tubes, dtype=np.float32), 8, amp=0.45
        )
        palettes = {i: pals[i] for i in range(n_tubes)}
        for i in range(n_tubes):
            a = 2.0 * np.pi * i / n_tubes
            instances.append(
                (tube, sc.Similarity(
                    translation=[3.2 * np.cos(a), 0.0, 3.2 * np.sin(a)]
                ))
            )
        for i in range(n_spheres):
            a = 2.0 * np.pi * (i + 0.5) / n_spheres
            instances.append(
                (sphere, sc.Similarity(
                    translation=[5.5 * np.cos(a), 1.2, 5.5 * np.sin(a)]
                ))
            )
        return build_frame_state(
            scene, instances, uniforms, joint_palettes=palettes
        )

    state0 = build_fixed()
    return _measure(frame, lambda: sc.render_frame(dev, state0, config, env))


def main():
    import jax

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import superconductor_tpu as sc

    head = bench_headline(sc)

    allp = None
    if os.path.exists(f"{REF_ASSETS}/models/sponza_cubes.glb"):
        try:
            allp = bench_all_passes(sc)
            if os.environ.get("SC_BENCH_SAVE"):
                import imageio.v3 as iio

                iio.imwrite(
                    os.environ["SC_BENCH_SAVE"].replace(".png", "_all.png"),
                    np.asarray(allp["img"])[0],
                )
        except Exception as e:  # report the primary even if this fails
            print(f"# all-passes bench failed: {e!r}", file=sys.stderr)

    stereo = None
    try:
        stereo = bench_stereo_animated(sc)
        if os.environ.get("SC_BENCH_SAVE"):
            import imageio.v3 as iio

            iio.imwrite(
                os.environ["SC_BENCH_SAVE"].replace(".png", "_stereo.png"),
                np.asarray(stereo["img"])[0],
            )
    except Exception as e:
        print(f"# stereo+animated bench failed: {e!r}", file=sys.stderr)

    if os.environ.get("SC_BENCH_SAVE"):
        import imageio.v3 as iio

        iio.imwrite(os.environ["SC_BENCH_SAVE"], np.asarray(head["img"])[0])

    fps = head["fps"]
    out = {
        "metric": "FPS 1920x1080 PBR+IBL 15.5k-tri scene (TPU v5e)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }

    def add(prefix, r, views=1):
        """Regression-proof device metrics: min-of-windows frame time on a
        fixed pre-built state + its run-internal spread + shaded px/s."""
        if r["device_ms"] is not None:
            out[f"{prefix}device_ms"] = round(r["device_ms"], 3)
            out[f"{prefix}device_spread"] = round(r["device_spread"], 3)
            out[f"{prefix}mpix_per_s"] = round(
                1920 * 1080 * views / (r["device_ms"] * 1e-3) / 1e6, 1
            )

    add("", head)
    if allp is not None:
        out["all_passes_fps"] = round(allp["fps"], 2)
        out["all_passes_vs_baseline"] = round(allp["fps"] / 60.0, 3)
        out["all_passes_scene"] = (
            "1080p, ~240k tris (dense_terrain 114k meshopt/LOD fixture + "
            "sponza_cubes + 8 spheres), bcn lightvol+noon IBL, "
            "clip+blend+lines+particles"
        )
        add("all_passes_", allp)
    if stereo is not None:
        out["stereo_anim_fps"] = round(stereo["fps"], 2)
        out["stereo_anim_vs_baseline"] = round(stereo["fps"] / 60.0, 3)
        out["stereo_anim_scene"] = (
            "2x1080p stereo, 6 skinned 8-joint tubes (37k anim tris) "
            "+ 6 PBR spheres (93k tris), per-frame FK palettes"
        )
        add("stereo_anim_", stereo, views=2)
    print(json.dumps(out))
    print(
        f"# backend={jax.default_backend()} "
        f"headline compile={head['compile_s']:.1f}s"
        + (f" all-passes compile={allp['compile_s']:.1f}s" if allp else "")
        + (f" stereo compile={stereo['compile_s']:.1f}s" if stereo else ""),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
