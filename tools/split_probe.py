#!/usr/bin/env python3
"""Two-phase frame experiment: do gathers from ARGUMENT tables beat the
one-jit frame?

gather_probe --computed measured the decisive asymmetry (2026-08-21):
the same (P, 76) f32 table gathers at ~1200 Mrows/s as a jit ARGUMENT
but ~16 Mrows/s when materialized inside the program — XLA assigns
computed buffers layouts that the gather path hates. Every hot table of
the deferred frame (vis_row, the sky base, the worklist planes) is
computed in-program today.

This probe builds the headline frame as TWO jits split at the table
boundary:

  phase A: geometry + binning + raster + sorted shade-row table + sky
           -> (vis, vis_row, sky) as jit OUTPUTS (device-resident)
  phase B: worklist build + deferred shade + compose + tonemap
           <- vis/vis_row/sky as jit ARGUMENTS

and measures the PAIR's dispatch-count slope (both dispatched
back-to-back, one honest readback — the executor drains serially, so
the slope is the sum of both phases' device time) against the one-jit
frame. Device time is what the slope measures; the extra per-program
dispatch cost is host-side and cancels.

Usage: python tools/split_probe.py [--size 1920x1080]
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
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))
    ns = tuple(int(n) for n in args.ns.split(","))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import superconductor_tpu as sc
    import bench as B
    from superconductor_tpu.ops.shade import interpolate_gbuffer, shade
    from superconductor_tpu.ops.sky import sample_skybox
    from superconductor_tpu.ops.tonemap import to_u8
    from superconductor_tpu.render import frame as F

    dev, build, config, env = B.headline_scene(sc, width, height)
    state = build(0.0)
    config = B.fit_caps(
        dev, state, config, env,
        cache_key=B._caps_cache_key(
            "headline", width, height,
            [os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "fixtures", "hero_helmet.glb")]))

    def eps(state, i):
        u = dict(state.uniforms)
        u["view_proj"] = u["view_proj"] * (1.0 + jnp.float32(i) * 1e-6)
        return state._replace(uniforms=u)

    def phase_a(dev, state, i):
        state = eps(state, i)
        vp = state.uniforms["view_proj"][0]
        tri, attrs = F._merged_geometry(dev, state, vp, config)
        mats = dev["materials"]
        blend_mode = mats["blend_mode"][attrs.material]
        parts = [tri.setup, attrs.packed]
        if "texels_mq" in dev and "mat_row_mq" in mats:
            parts.append(mats["mat_row_mq"][attrs.material])
        shade_row = jnp.concatenate(parts, axis=1)
        opaque = tri._replace(valid=tri.valid & (blend_mode == 0))
        vis, _pairs, order = F._rasterize(
            opaque, config, config.height, 0, remap=False
        )
        vis_row = shade_row[order]
        u = state.uniforms
        sky = sample_skybox(
            dev, env, width, height, u["projection_inverse"][0],
            u["view_inverse_quat"][0],
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb, y_offset=0, full_height=height,
        )
        return vis.depth, vis.pair, vis_row, sky

    def phase_b(dev, state, depth, pair, vis_row, sky, i):
        state = eps(state, i)
        u = state.uniforms
        hit = (pair >= 0).reshape(-1)
        wl = F._compact_worklist(hit, config.opaque_px_cap, config)
        opx, opy = F._px_py_at(wl.lane_safe(), width, 0)
        # tri/attrs only feed the no-shade_row fallback; pass None-like
        # shapes via the real geometry (cheap, fused away when unused).
        vp = state.uniforms["view_proj"][0]
        tri, attrs = F._merged_geometry(dev, state, vp, config)
        g = interpolate_gbuffer(
            jnp.where(wl.lane_live(), wl.take(pair.reshape(-1)), -1),
            opx, opy, tri, attrs, shade_row=vis_row,
        )
        rgb_w, _ = shade(
            g, dev, u, 0, env=env,
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb, aniso_taps=config.aniso_taps,
        )
        rgb = wl.compose(
            sky, jnp.where(g.valid[..., None], rgb_w, wl.take(sky))
        )
        img = jnp.concatenate(
            [rgb, jnp.ones_like(rgb[..., :1])], axis=-1
        ).reshape(1, height, width, 4)
        return to_u8(img)

    def full_fn(dev, state, i):
        return F.render_frame_impl(dev, eps(state, i), config, env)

    i0 = jnp.int32(0)
    t0 = time.time()

    def compile_a():
        return jax.jit(phase_a).lower(dev, state, i0).compile()

    def compile_b():
        a_out = jax.eval_shape(phase_a, dev, state, i0)
        dummies = [jnp.zeros(s.shape, s.dtype) for s in a_out]
        return jax.jit(phase_b).lower(dev, state, *dummies, i0).compile(), None

    def compile_full():
        return jax.jit(full_fn).lower(dev, state, i0).compile()

    with ThreadPoolExecutor(max_workers=3) as ex:
        fa = ex.submit(compile_a)
        fb = ex.submit(compile_b)
        ff = ex.submit(compile_full)
        ca, (cb, _), cf = fa.result(), fb.result(), ff.result()
    print(f"# compiled 3 programs in {time.time() - t0:.1f}s wall",
          file=sys.stderr, flush=True)

    def slope(dispatch, name):
        out = dispatch(i0)
        jax.device_get(jnp.ravel(out)[0])
        meds = {n: [] for n in ns}
        for c in range(args.calls):
            for n in ns:
                t0 = time.perf_counter()
                o = None
                for i in range(n):
                    o = dispatch(jnp.int32(c * 31 + i + 1))
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

    def two_phase(i):
        d, p, vr, sk = ca(dev, state, i)
        return cb(dev, state, d, p, vr, sk, i)

    d_full = slope(lambda i: cf(dev, state, i), "one_jit_frame")
    d_split = slope(two_phase, "two_phase_frame")
    print(json.dumps({
        "one_jit_ms": round(d_full, 2),
        "two_phase_ms": round(d_split, 2),
        "delta_ms": round(d_full - d_split, 2),
        "size": args.size,
    }))


if __name__ == "__main__":
    main()
