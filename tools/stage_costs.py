#!/usr/bin/env python3
"""Honest per-stage cost attribution for the headline frame (TPU).

Times PARTIAL frame pipelines so stage cost falls out of differences:

    geometry  = t(geom)
    binning   = t(geom+bin)   - t(geom)
    raster    = t(to_vis)     - t(geom+bin)
    shading   = t(full frame) - t(to_vis)   (gbuffer+shade+sky+tonemap)

Each partial pipeline is ONE jitted program measured as a
DISPATCH-COUNT SLOPE (t(n=8) - t(n=1)) / 7 with an honest 4-byte
readback after the last dispatch — the same metric as tools/ab_device.py
(~2% precision; the old k=1-minus-RTT form here had +-5 ms noise, which
once attributed 15 ms to a ~3 ms raster pass). Uses the real bench
headline scene (bench.headline_scene + fit_caps), so capacities match
what bench.py times.

Caveat: partial pipelines fuse differently than the full frame (the
whole point of one-jit frames, docs/KERNELS.md), and the scalar-reduced
outputs of the partial stages can de-optimize layouts — deltas are
attribution-grade, not exact.

Usage: python tools/stage_costs.py [--size 1920x1080] [--calls 3]
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
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--ns", default="1,2,8")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))
    ns = tuple(int(n) for n in args.ns.split(","))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import superconductor_tpu as sc
    import bench as B
    from superconductor_tpu.ops.binning import bin_triangles, gather_sorted_setup
    from superconductor_tpu.ops.raster_pallas import rasterize_pallas
    from superconductor_tpu.render.frame import _merged_geometry, render_frame_impl

    dev, build, config, env = B.headline_scene(sc, width, height)
    state = build(0.0)
    config = B.fit_caps(dev, state, config, env)

    # Perturb uniforms per dispatch so back-to-back calls cannot be
    # served from any result cache (they are distinct executions anyway,
    # but keep the inputs honest).
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
        bins = bin_triangles(
            tri, config.width, config.height, config.p_cap,
            tile_h=config.tile_h, tile_w=config.tile_w,
        )
        ss = gather_sorted_setup(tri, bins)
        return ss.sum() + bins.tile_count.sum()

    @jax.jit
    def to_vis(dev, state, i):
        st = state._replace(uniforms=eps(state.uniforms, i))
        vp = st.uniforms["view_proj"][0]
        tri, attrs = _merged_geometry(dev, st, vp, config)
        bins = bin_triangles(
            tri, config.width, config.height, config.p_cap,
            tile_h=config.tile_h, tile_w=config.tile_w,
        )
        ss = gather_sorted_setup(tri, bins)
        vis = rasterize_pallas(ss, bins, config.height, config.width,
                               reverse_z=config.reverse_z,
                               tile_h=config.tile_h, tile_w=config.tile_w)
        return vis.depth.sum() + vis.pair.sum()

    @jax.jit
    def frame(dev, state, i):
        return render_frame_impl(
            dev, state._replace(uniforms=eps(state.uniforms, i)),
            config=config, env=env,
        )

    def slope(fn, name):
        t0 = time.time()
        jax.device_get(jnp.ravel(fn(dev, state, 0))[0])
        compile_s = time.time() - t0
        meds = {n: [] for n in ns}
        for c in range(args.calls):
            for n in ns:
                t0 = time.perf_counter()
                out = None
                for i in range(n):
                    out = fn(dev, state, c * 31 + i + 1)
                jax.device_get(jnp.ravel(out)[0])
                meds[n].append(time.perf_counter() - t0)
        t = {n: sorted(v)[len(v) // 2] * 1e3 for n, v in meds.items()}
        n1, nl = ns[0], ns[-1]
        d = (t[nl] - t[n1]) / (nl - n1)
        row = {"stage": name, "device_ms": round(d, 1),
               "compile_s": round(compile_s, 1)}
        if len(ns) >= 3:
            nm = ns[1]
            row["check_ms"] = [round((t[nm] - t[n1]) / (nm - n1), 1),
                               round((t[nl] - t[nm]) / (nl - nm), 1)]
        print(json.dumps(row), flush=True)
        return d

    tg = slope(geom, "geometry")
    tgb = slope(geom_bin, "geometry+binning")
    tv = slope(to_vis, "geometry+binning+raster")
    tf = slope(frame, "full frame (image out)")

    print(json.dumps({
        "attribution_ms": {
            "geometry": round(tg, 1),
            "binning": round(tgb - tg, 1),
            "raster": round(tv - tgb, 1),
            "shade+sky+tonemap": round(tf - tv, 1),
            "full_frame": round(tf, 1),
        },
        "size": f"{width}x{height}",
    }))


if __name__ == "__main__":
    main()
