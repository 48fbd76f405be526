#!/usr/bin/env python3
"""Honest per-stage cost attribution for the headline frame (TPU).

Times PARTIAL frame pipelines (each its own jit, chained-dependency
calls with a readback barrier per call — docs/TIMING.md) so stage cost
falls out of differences:

    geometry  = t(geom)
    binning   = t(geom+bin)   - t(geom)
    raster    = t(to_vis)     - t(geom+bin)
    shading   = t(full frame) - t(to_vis)   (gbuffer+shade+sky+tonemap)

Caveat: partial pipelines fuse differently than the full frame (the
whole point of one-jit frames, docs/KERNELS.md), so deltas are
attribution-grade, not exact. The full-frame number is the honest
bench.py device_delta_ms methodology at k=1 (absolute includes ~1 RTT,
subtracted via bench._probe_rtt).

Usage: python tools/stage_costs.py [--size 1920x1080] [--calls 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import superconductor_tpu as sc
    import bench as B
    from superconductor_tpu.ops.binning import bin_triangles, gather_sorted_setup
    from superconductor_tpu.ops.raster_pallas import rasterize_pallas
    from superconductor_tpu.render.frame import _merged_geometry, render_frame_impl

    orig = B._measure

    def fm(frame_fn, device_fn=None, **kw):
        img = frame_fn(0.0)
        img.block_until_ready()
        return {"fps": 0.0, "compile_s": 0.0, "img": img,
                "device_ms": None, "device_spread": None}

    B._measure = fm
    cap = {}
    ob = B.bench_headline
    import functools

    def capture_headline(sc_, width=1920, height=1080):
        r = ob(sc_, width=width, height=height)
        return r

    # rebuild the scene pieces exactly as bench_headline does
    from superconductor_tpu.math3d import (
        look_at, mat3_to_quat, mat4_inverse,
    )
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere, default_ambient_sh, gradient_cubemap,
    )

    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    cubemap_base = gradient_cubemap(scene)
    import numpy as np

    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    B._aim(cam, [0, 0, 0], look_at, mat4_inverse, mat3_to_quat)
    uniforms = sc.make_uniforms(cam, width, height)
    env = sc.EnvBindings(
        ibl_cubemap_base=cubemap_base, ambient_sh=default_ambient_sh()
    )
    config = sc.RenderConfig(
        width=width, height=height, t_cap=1 << 15, t_cap_anim=1 << 6,
        p_cap=1 << 17, raster="auto",
    )
    dev = scene.device_arrays()
    state = build_frame_state(scene, [(model, sc.Similarity())], uniforms)
    B._measure = orig

    # --- partial pipelines (scalar-reduced outputs keep transfer tiny;
    # a scalar output can de-optimize the frame body (bench.make_unrolled
    # docstring), but within ONE pipeline the comparison is still valid —
    # each stage's time is measured under the same output convention,
    # except `frame` which keeps the image output like production).
    def eps(u, i):
        uu = dict(u)
        uu["view_proj"] = uu["view_proj"] * (1.0 + jnp.float32(i) * 1e-6)
        return uu

    @jax.jit
    def geom(dev, state, i):
        tri, attrs = _merged_geometry(
            dev, state._replace(uniforms=eps(state.uniforms, i)),
            eps(state.uniforms, i)["view_proj"][0], config,
        )
        return tri.setup.sum() + tri.bbox.sum()

    @jax.jit
    def geom_bin(dev, state, i):
        st = state._replace(uniforms=eps(state.uniforms, i))
        vp = st.uniforms["view_proj"][0]
        tri, attrs = _merged_geometry(dev, st, vp, config)
        bins = bin_triangles(tri, config.width, config.height, config.p_cap)
        ss = gather_sorted_setup(tri, bins)
        return ss.sum() + bins.tile_count.sum()

    @jax.jit
    def to_vis(dev, state, i):
        st = state._replace(uniforms=eps(state.uniforms, i))
        vp = st.uniforms["view_proj"][0]
        tri, attrs = _merged_geometry(dev, st, vp, config)
        bins = bin_triangles(tri, config.width, config.height, config.p_cap)
        ss = gather_sorted_setup(tri, bins)
        vis = rasterize_pallas(ss, bins, config.height, config.width,
                               reverse_z=config.reverse_z)
        return vis.depth.sum() + vis.pair.sum()

    @jax.jit
    def frame(dev, state, i):
        return render_frame_impl(
            dev, state._replace(uniforms=eps(state.uniforms, i)),
            config=config, env=env,
        )

    def timed(fn, name):
        t0 = time.time()
        jax.device_get(jnp.ravel(fn(dev, state, 0))[0])
        compile_s = time.time() - t0
        ts = []
        for i in range(args.calls):
            t0 = time.perf_counter()
            jax.device_get(jnp.ravel(fn(dev, state, i + 1))[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2] * 1e3
        row = {"stage": name, "ms": round(med, 1),
               "min_ms": round(ts[0] * 1e3, 1),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(row), flush=True)
        return med

    # RTT floor to subtract from absolutes
    x = jnp.zeros((4,), jnp.float32)
    jax.device_get(x[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(x[0])
        ts.append(time.perf_counter() - t0)
    rtt = sorted(ts)[2] * 1e3
    print(json.dumps({"rtt_ms": round(rtt, 1)}), flush=True)

    tg = timed(geom, "geometry")
    tgb = timed(geom_bin, "geometry+binning")
    tv = timed(to_vis, "geometry+binning+raster")
    tf = timed(frame, "full frame (image out)")

    print(json.dumps({
        "attribution_ms": {
            "geometry": round(tg - rtt, 1),
            "binning": round(tgb - tg, 1),
            "raster": round(tv - tgb, 1),
            "shade+sky+tonemap": round(tf - tv, 1),
            "full_frame_minus_rtt": round(tf - rtt, 1),
        },
        "size": f"{width}x{height}",
    }))


if __name__ == "__main__":
    main()
