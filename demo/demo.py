#!/usr/bin/env python3
"""Demo app: the analog of the reference's demo crate (demo/src/lib.rs).

Loads a glTF scene (default: the Sponza assets bundled with the reference,
if present), the Sponza SH light volume, sets up a fly-ish camera path, and
renders N frames to PNG files.

Usage:
    python demo/demo.py [--model PATH_OR_URL] [--frames N] [--size WxH]
                        [--out DIR] [--raster auto|ref|pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REF_ASSETS = "/root/reference/demo/web/assets"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="glTF/GLB path (default: sponza)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--out", default="/tmp/sc_demo")
    ap.add_argument("--raster", default="auto")
    ap.add_argument("--particles", action="store_true", help="spawn test particles")
    ap.add_argument("--debug-lines", action="store_true", help="ground grid lines")
    ap.add_argument(
        "--debug-overlays",
        action="store_true",
        help="skeleton + bounding-box line overlays (src/systems/debugging.rs)",
    )
    ap.add_argument(
        "--path",
        default="orbit",
        choices=["orbit", "fly"],
        help="camera path: smoothed orbit, or a scripted fly-through",
    )
    ap.add_argument(
        "--script",
        default=None,
        help="camera script file for --path fly (see render/rig.py syntax)",
    )
    ap.add_argument(
        "--head-turn",
        action="store_true",
        help="VRM head-turn analog: sinusoidal yaw on animated models' last "
        "joint (demo/src/lib.rs:196-228)",
    )
    ap.add_argument(
        "--animated-model",
        default=None,
        help="additionally spawn an animated glTF/GLB at the origin",
    )
    ap.add_argument(
        "--ibl",
        default=None,
        help="IBL cubemap ktx2 (default: reference noon.ktx2 if present)",
    )
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
    )

    import superconductor_tpu as sc
    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from superconductor_tpu.ecs.app import App
    from superconductor_tpu.ecs.components import Instance, InstanceOf, ModelUrl
    from superconductor_tpu.ecs.resources import (
        CameraResource,
        FrameOutput,
        LineBuffer,
        NewLightvolTextures,
        ParticleBuffer,
        RenderSettings,
    )
    from superconductor_tpu.ecs.systems import CorePlugin
    from superconductor_tpu.assets.fetch import FileClient
    from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse

    model_path = args.model
    if model_path is None:
        candidate = os.path.join(REF_ASSETS, "models/Sponza/glTF/Sponza.gltf")
        # the reference checkout ships Sponza.gltf without its .bin
        if os.path.exists(candidate) and os.path.exists(
            os.path.join(os.path.dirname(candidate), "Sponza.bin")
        ):
            model_path = candidate
        else:
            candidate = os.path.join(REF_ASSETS, "models/sponza_cubes.glb")
            model_path = candidate if os.path.exists(candidate) else None
    if model_path is None:
        print("no model found; pass --model", file=sys.stderr)
        return 1

    app = App()
    app.add_plugin(
        CorePlugin(
            config=sc.RenderConfig(
                width=width,
                height=height,
                t_cap=1 << 18,
                t_cap_anim=1 << 8,
                p_cap=1 << 19,
                raster=args.raster,
                enable_clip=True,
                enable_blend=True,
                enable_lines=args.debug_lines or args.debug_overlays,
                enable_particles=args.particles,
            ),
            client=FileClient(),
        )
    )
    w = app.world

    # Sponza lightvol if available (NewLightvolTextures message, like
    # demo/src/lib.rs:135-192 configures; box extents eyeballed for Sponza).
    lv_dir = os.path.join(REF_ASSETS, "lighting/uncompressed")
    if os.path.exists(os.path.join(lv_dir, "lightvol.ktx2")):
        w.insert_resource(
            NewLightvolTextures(
                urls=[
                    os.path.join(lv_dir, "lightvol.ktx2"),
                    os.path.join(lv_dir, "lightvol_x.ktx2"),
                    os.path.join(lv_dir, "lightvol_y.ktx2"),
                    os.path.join(lv_dir, "lightvol_z.ktx2"),
                ],
                bottom_left=(-12.0, 0.0, -6.0),  # ProbesArrayInfo center (0,6,0), extent (24,12,12)
                scale=(24.0, 12.0, 12.0),
            )
        )

    # IBL cubemap (NewIblCubemap message, demo/src/lib.rs:114-119).
    from superconductor_tpu.ecs.resources import NewIblCubemap

    ibl = args.ibl or os.path.join(REF_ASSETS, "cubemaps/noon.ktx2")
    if os.path.exists(ibl):
        w.insert_resource(NewIblCubemap(ibl))

    model_e = w.spawn(ModelUrl(model_path))
    w.spawn(Instance(sc.Similarity()), InstanceOf(model_e))

    if args.animated_model:
        from superconductor_tpu.ecs.components import AnimatedModelUrl

        anim_e = w.spawn(AnimatedModelUrl(args.animated_model))
        w.spawn(Instance(sc.Similarity()), InstanceOf(anim_e))

    # Per-frame pushes must happen AFTER BufferResetting clears; register
    # a system in the InstanceBuffering stage (like the reference's debug
    # systems, src/systems/debugging.rs).
    from superconductor_tpu.ecs.app import Stage

    frame_no = {"n": 0}

    def push_debug_content(world):
        n = frame_no["n"]
        if args.particles:
            pb = world.resource(ParticleBuffer)
            for k in range(8):
                pb.push(
                    center=[1.5 * np.cos(0.8 * k), 1.0 + 0.25 * k, 1.5 * np.sin(0.8 * k)],
                    scale=[1.2, 1.2],
                    colour=[0.85, 0.85, 0.9],
                    emissive_colour=[0.4, 0.25, 0.1],
                )
        if args.debug_lines:
            lb = world.resource(LineBuffer)
            for g in range(-5, 6):
                lb.push([g, 0.02, -5], [g, 0.02, 5], 7)
                lb.push([-5, 0.02, g], [5, 0.02, g], 11)

    app.add_system(Stage.INSTANCE_BUFFERING, push_debug_content)

    if args.debug_overlays:
        from superconductor_tpu.ecs.debugging import (
            push_bounding_boxes_to_lines,
            push_joints_to_lines,
        )

        app.add_system(Stage.INSTANCE_BUFFERING, push_joints_to_lines)
        app.add_system(Stage.INSTANCE_BUFFERING, push_bounding_boxes_to_lines)

    if args.head_turn:
        # VRM head-turn analog (animate_vrms, demo/src/lib.rs:196-228):
        # after animation sampling, yaw the last joint sinusoidally.
        from superconductor_tpu.ecs.components import (
            InstanceOf as _IOf,
            JointsComponent,
            ModelComponent,
        )
        from superconductor_tpu.math3d import quat_from_axis_angle

        def turn_heads(world):
            t = frame_no["n"] / 60.0
            yaw = 0.7 * np.sin(t * 2.0 * np.pi / 2.0)
            for _e, jc, of in world.query(JointsComponent, _IOf):
                mc = world.get(of.model_entity, ModelComponent)
                if mc is None or mc.model.num_joints == 0:
                    continue
                head = int(mc.model.joint_node_indices[-1])
                jc.joints.set_local(
                    head,
                    sc.Similarity(
                        translation=jc.joints.local_translation[head],
                        rotation=quat_from_axis_angle([0, 1, 0], yaw),
                        scale=float(jc.joints.local_scale[head]),
                    ),
                )

        app.add_system(Stage.INSTANCE_BUFFERING, turn_heads)

    os.makedirs(args.out, exist_ok=True)
    import imageio.v3 as iio

    from superconductor_tpu.render.rig import FlyCameraRig, parse_camera_script

    # Dolly-smoothed camera rig (CameraRig<Position+YawPitch+Smooth>,
    # demo/src/lib.rs:88-98, 374-397).
    rig = FlyCameraRig(position=(8.0, 2.0, 3.0), speed=6.0)
    rig.look_at((8.0, 2.0, 3.0), (0, 1.5, 0))
    rig.pos = rig.target_pos.copy()
    rig.yaw, rig.pitch = rig.target_yaw, rig.target_pitch
    script = None
    if args.path == "fly":
        if args.script:
            with open(args.script) as f:
                script = parse_camera_script(f.read())
        else:
            # default fly-through: push forward, sweep right, climb
            script = parse_camera_script(
                "0-30 w\n31-60 w+d mouse=1.2,0\n61-90 w mouse=-1.2,-0.4\n"
                "91-999 w+e mouse=0.6,0.3\n"
            )

    cam_res = w.resource(CameraResource)
    n = 0
    t_start = time.time()
    frame_times = []
    dt = 1.0 / 60.0
    while n < args.frames:
        if script is not None:
            keys, mouse = script.get(n, (set(), (0.0, 0.0)))
            rig.apply_keys(keys, dt=dt, mouse=mouse)
        else:
            # orbit waypoints; the rig smooths between them
            ang = 0.35 + 0.1 * n
            eye = np.array(
                [8.0 * np.cos(ang), 2.0, 8.0 * np.sin(ang)], np.float32
            )
            rig.look_at(eye, [0, 1.5, 0])
        cam_res.camera.position, cam_res.camera.rotation = rig.update(dt)

        frame_no["n"] = n
        t0 = time.time()
        app.update()
        out = w.resource(FrameOutput)
        if out.image is None:
            continue
        img = np.asarray(out.image)[0]
        frame_times.append(time.time() - t0)
        iio.imwrite(os.path.join(args.out, f"frame_{n:03d}.png"), img)
        n += 1

    print(
        f"rendered {args.frames} frames {width}x{height} in "
        f"{time.time() - t_start:.1f}s "
        f"(median frame {1e3 * np.median(frame_times):.1f}ms incl. host)"
    )
    print(f"frames in {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
