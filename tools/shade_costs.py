#!/usr/bin/env python3
"""Fine-grained attribution of the headline frame's SHADE stage (TPU).

tools/stage_costs.py splits the frame into geometry/binning/raster/rest;
"rest" (worklist compaction + deferred shade + sky + tonemap) is where
the milliseconds live, so this tool subdivides it with a ladder of
partial programs on the real bench scene:

    base       geometry+bin+raster+worklist build+composite (const rows)
    gbuf       base + shade_row gather + gbuffer interpolation
    mat        gbuf + interleaved material sampling (the 2 matq gathers)
    full_nosky the complete frame with a clear-color environment
    full       the complete frame
    sky_only   full-screen skybox + tonemap alone (cross-check)

Deltas: worklist/raster floor = base; shade_row+interp = gbuf-base;
material taps = mat-gbuf; BRDF/SH/compose math = full_nosky-mat;
skybox = full-full_nosky (cross-checked against sky_only).

All programs keep IMAGE-shaped outputs (scalar reductions de-optimize
frame layouts — docs/KERNELS.md) and are measured as dispatch-count
slopes with honest readback (docs/TIMING.md). Compiles run in PARALLEL
threads via AOT lower().compile() — the remote compile queue is the
dominant cost of attribution on this environment, and N programs in one
queue round-trip beat N serial waits.

Usage: python tools/shade_costs.py [--size 1920x1080] [--probes base,gbuf,...]
"""

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--ns", default="1,2,8")
    ap.add_argument("--probes", default="base,gbuf,mat,full_nosky,full,sky_only")
    ap.add_argument("--serial-compile", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS=cpu does "
                         "NOT stick under the axon sitecustomize)")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))
    ns = tuple(int(n) for n in args.ns.split(","))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import superconductor_tpu as sc
    import bench as B
    from superconductor_tpu.ops.shade import interpolate_gbuffer, shade
    from superconductor_tpu.ops.sky import sample_skybox
    from superconductor_tpu.ops.texture import sample_material_interleaved
    from superconductor_tpu.ops.shade import _material_rows_mq
    from superconductor_tpu.render import frame as F

    dev, build, config, env = B.headline_scene(sc, width, height)
    state = build(0.0)
    config = B.fit_caps(
        dev, state, config, env,
        cache_key=B._caps_cache_key(
            "headline", width, height,
            [os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "fixtures", "hero_helmet.glb")]))
    print(f"# caps: opaque_px_cap={config.opaque_px_cap} "
          f"p_cap={config.p_cap} granule={config.granule_px}",
          file=sys.stderr, flush=True)

    def eps(state, i):
        u = dict(state.uniforms)
        u["view_proj"] = u["view_proj"] * (1.0 + jnp.float32(i) * 1e-6)
        return state._replace(uniforms=u)

    # --- shared front half (mirrors render_view's opaque path) ---
    def front(dev, state):
        """-> (worklist, vis, vis_row, merged geometry, px/py fn)."""
        vp = state.uniforms["view_proj"][0]
        tri, attrs = F._merged_geometry(dev, state, vp, config)
        mats = dev["materials"]
        blend_mode = mats["blend_mode"][attrs.material]
        parts = [tri.setup, attrs.packed]
        if "texels_mq" in dev and "mat_row_mq" in mats:
            parts.append(mats["mat_row_mq"][attrs.material])
        shade_row = jnp.concatenate(parts, axis=1)
        opaque = tri._replace(valid=tri.valid & (blend_mode == 0))
        sorted_mode = (
            F.SORTED_PAIR_MODE and config.resolve_raster() == "pallas"
        )
        vis, _pairs, order = F._rasterize(
            opaque, config, config.height, 0, remap=not sorted_mode
        )
        vis_row = shade_row[order] if sorted_mode else shade_row
        hit = (vis.pair >= 0).reshape(-1)
        wl = F._compact_worklist(hit, config.opaque_px_cap, config)
        return wl, vis, vis_row, tri, attrs

    def img_of(rgb):
        return jnp.concatenate(
            [rgb, jnp.ones_like(rgb[..., :1])], axis=-1
        ).reshape(height, width, 4)

    def tovis_fn(dev, state, i):
        # geometry+binning+raster only, image-shaped output (no worklist):
        # base - tovis isolates the worklist+compose block in a frame-like
        # program; tovis vs the standalone kernel probe isolates
        # frame-context raster cost.
        state = eps(state, i)
        wl, vis, vis_row, tri, attrs = front(dev, state)
        d = vis.depth.reshape(-1, 1)
        rgb = jnp.concatenate([d, d * 0.5, d * 0.25], axis=-1)
        return img_of(rgb)

    def base_fn(dev, state, i):
        state = eps(state, i)
        wl, vis, vis_row, tri, attrs = front(dev, state)
        npx = height * width
        sky = jnp.zeros((npx, 3), jnp.float32) + 0.25
        rows = wl.take(sky) * 0.5  # touch the worklist, no shade gathers
        return img_of(wl.compose(sky, rows))

    def gbuf_fn(dev, state, i):
        state = eps(state, i)
        wl, vis, vis_row, tri, attrs = front(dev, state)
        npx = height * width
        opx, opy = F._px_py_at(wl.lane_safe(), width, 0)
        g = interpolate_gbuffer(
            jnp.where(wl.lane_live(), wl.take(vis.pair.reshape(-1)), -1),
            opx, opy, tri, attrs, shade_row=vis_row,
        )
        sky = jnp.zeros((npx, 3), jnp.float32) + 0.25
        rows = g.normal * 0.25 + g.world_pos * 0.125 + g.uv.sum(-1)[..., None]
        rows = jnp.where(g.valid[..., None], rows, wl.take(sky))
        return img_of(wl.compose(sky, rows))

    def mat_fn(dev, state, i):
        state = eps(state, i)
        wl, vis, vis_row, tri, attrs = front(dev, state)
        npx = height * width
        opx, opy = F._px_py_at(wl.lane_safe(), width, 0)
        g = interpolate_gbuffer(
            jnp.where(wl.lane_live(), wl.take(vis.pair.reshape(-1)), -1),
            opx, opy, tri, attrs, shade_row=vis_row,
        )
        pf, pi, mq_meta, mq_owh = _material_rows_mq(
            dev["materials"], g.material, g
        )
        s16 = sample_material_interleaved(
            dev["texels_mq"], mq_meta, mq_owh, g.uv, g.duvdx, g.duvdy, 1,
            texels_tail=dev.get("texels_mq_tail"),
        )
        sky = jnp.zeros((npx, 3), jnp.float32) + 0.25
        rows = s16[..., 0:3] * 0.5 + s16[..., 8:11] * 0.25 \
            + s16[..., 12:15] * 0.25
        rows = jnp.where(g.valid[..., None], rows, wl.take(sky))
        return img_of(wl.compose(sky, rows))

    def full_fn(dev, state, i):
        return F.render_frame_impl(dev, eps(state, i), config, env)

    import dataclasses

    env_nosky = dataclasses.replace(
        env, ibl_cubemap_base=-1, ibl_cubemap_static=None,
        clear_color=(0.1, 0.2, 0.3),
    ) if hasattr(env, "ibl_cubemap_base") else env

    def full_nosky_fn(dev, state, i):
        return F.render_frame_impl(dev, eps(state, i), config, env_nosky)

    def sky_only_fn(dev, state, i):
        state = eps(state, i)
        u = state.uniforms
        rgb = sample_skybox(
            dev, env, width, height, u["projection_inverse"][0],
            u["view_inverse_quat"][0],
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb, y_offset=0, full_height=height,
        )
        return img_of(rgb)

    fns = {
        "base": base_fn, "gbuf": gbuf_fn, "mat": mat_fn,
        "full_nosky": full_nosky_fn, "full": full_fn, "sky_only": sky_only_fn,
        "tovis": tovis_fn,
    }
    want = [p for p in args.probes.split(",") if p in fns]

    # --- compile all probes in parallel (AOT lower + compile) ---
    i0 = jnp.int32(0)
    t0 = time.time()

    def compile_one(name):
        t = time.time()
        lowered = jax.jit(fns[name]).lower(dev, state, i0)
        compiled = lowered.compile()
        return name, compiled, time.time() - t

    compiled = {}
    if args.serial_compile:
        for name in want:
            n, c, s = compile_one(name)
            compiled[n] = c
            print(f"# compiled {n} in {s:.1f}s", file=sys.stderr, flush=True)
    else:
        with ThreadPoolExecutor(max_workers=len(want)) as ex:
            for n, c, s in ex.map(compile_one, want):
                compiled[n] = c
                print(f"# compiled {n} in {s:.1f}s (parallel)",
                      file=sys.stderr, flush=True)
    print(f"# all compiles in {time.time() - t0:.1f}s wall",
          file=sys.stderr, flush=True)

    def slope(name):
        fn = compiled[name]
        out = fn(dev, state, i0)
        jax.device_get(jnp.ravel(out)[0])  # settle
        meds = {n: [] for n in ns}
        for c in range(args.calls):
            for n in ns:
                t0 = time.perf_counter()
                o = None
                for i in range(n):
                    o = fn(dev, state, jnp.int32(c * 31 + i + 1))
                jax.device_get(jnp.ravel(o)[0])
                meds[n].append(time.perf_counter() - t0)
        t = {n: sorted(v)[len(v) // 2] * 1e3 for n, v in meds.items()}
        n1, nl = ns[0], ns[-1]
        d = (t[nl] - t[n1]) / (nl - n1)
        row = {"probe": name, "device_ms": round(d, 2)}
        if len(ns) >= 3:
            nm = ns[1]
            row["check_ms"] = [round((t[nm] - t[n1]) / (nm - n1), 2),
                               round((t[nl] - t[nm]) / (nl - nm), 2)]
        print(json.dumps(row), flush=True)
        return d

    r = {name: slope(name) for name in want}
    att = {}
    if "base" in r:
        att["geom+bin+raster+worklist"] = round(r["base"], 2)
    if "gbuf" in r and "base" in r:
        att["shade_row_gather+interp"] = round(r["gbuf"] - r["base"], 2)
    if "mat" in r and "gbuf" in r:
        att["material_taps"] = round(r["mat"] - r["gbuf"], 2)
    if "full_nosky" in r and "mat" in r:
        att["brdf_sh_compose"] = round(r["full_nosky"] - r["mat"], 2)
    if "full" in r and "full_nosky" in r:
        att["skybox"] = round(r["full"] - r["full_nosky"], 2)
    if "sky_only" in r:
        att["skybox_standalone"] = round(r["sky_only"], 2)
    if "full" in r:
        att["full_frame"] = round(r["full"], 2)
    print(json.dumps({"attribution_ms": att, "size": args.size}))


if __name__ == "__main__":
    main()
