"""Compile-time vs runtime trade-off measurement (VERDICT r1 item 7).

Measures XLA compile wall-time and steady-state frame time for the
headline 1080p config at several `exec_time_optimization_effort` settings
(the public XLA knob for "spend less/more time optimizing"). Run with an
idle compile queue; results land in docs/COMPILE.md.

Usage: python tools/compile_time_experiment.py [width height]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    import superconductor_tpu as sc
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.render.frame import render_frame_impl
    from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
        gradient_cubemap,
    )

    width = int(sys.argv[1]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080

    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    cubemap_base = gradient_cubemap(scene)
    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    v = look_at(cam.position, [0, 0, 0])
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uniforms = sc.make_uniforms(cam, width, height)
    env = sc.EnvBindings(
        ibl_cubemap_base=cubemap_base, ambient_sh=default_ambient_sh()
    )
    dev = scene.device_arrays()
    state = build_frame_state(scene, [(model, sc.Similarity())], uniforms)

    def run(label, effort, t_cap_bump=0):
        # vary t_cap so every case compiles fresh (no executable reuse)
        config = sc.RenderConfig(
            width=width, height=height, t_cap=(1 << 15) + 16 * t_cap_bump,
            t_cap_anim=1 << 6, p_cap=1 << 17, raster="auto",
        )
        opts = {}
        if effort is not None:
            opts["exec_time_optimization_effort"] = effort
        fn = jax.jit(
            render_frame_impl,
            static_argnames=("config", "env"),
            compiler_options=opts or None,
        )
        t0 = time.time()
        img = fn(dev, state, config, env)
        img.block_until_ready()
        compile_s = time.time() - t0
        for _ in range(3):
            fn(dev, state, config, env).block_until_ready()
        rates = []
        for w in range(5):
            t0 = time.time()
            for _ in range(30):
                img = fn(dev, state, config, env)
            img.block_until_ready()
            rates.append((time.time() - t0) / 30)
        ms = float(np.median(rates)) * 1e3
        print(f"{label:>28}: compile {compile_s:7.1f}s  frame {ms:7.3f} ms",
              flush=True)
        return compile_s, ms

    print(f"# {width}x{height}, backend={jax.default_backend()}", flush=True)
    run("default", None, 0)
    run("effort -1.0 (min)", -1.0, 1)
    run("effort -0.5", -0.5, 2)
    run("effort +1.0 (max)", 1.0, 3)


if __name__ == "__main__":
    main()
