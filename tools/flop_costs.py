#!/usr/bin/env python3
"""Per-pass compiled-cost attribution via XLA cost_analysis (no device
timing needed — runs anywhere, including with the TPU tunnel down).

Same rung ladder as tools/pass_costs.py (opaque -> +clip -> +blend ->
+lines -> +particles == all-passes): each rung is lowered and compiled
as its own executable and XLA's cost model reports compiled FLOPs and
bytes accessed. The DELTA between rungs is the incremental compiled
cost of that pass family after full fusion.

This is the portable half of the perf story (docs/TIMING.md): the axon
executor's absolute timings are emulation-class, so optimization work
should target op counts and memory traffic — exactly what this prints.
Caveats: the cost model is the *compiled* program for the chosen
backend (default CPU; fusion differs from TPU), and "bytes accessed"
counts HBM-level operand traffic, not cache behavior.

Cap sizing: fit_caps EXECUTES a stats frame, and on CPU the ref raster
is O(T*H*W) — infeasible at bench sizes with the dense terrain. So on
CPU: the pair cap is computed exactly at full size from binning alone
(O(T)); the pixel-coverage caps are fitted at a downscaled resolution
(default 1/8 per axis) and scaled back up by the area ratio before the
pow2 growth margin; blend_layers transfers unscaled. Pass --fit-scale 1
on TPU for the exact fit.

Usage: python tools/flop_costs.py [--size 960x540] [--backend cpu]
Prints one JSON line per rung plus a summary.
"""

import argparse
import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="960x540")
    ap.add_argument("--backend", default="cpu",
                    help="cpu (works with the tunnel down) or tpu")
    ap.add_argument("--raster", default=None,
                    help="override raster method (default: config default)")
    ap.add_argument("--opaque-cap", type=int, default=None,
                    help="override opaque_px_cap (0 = full-screen shade; "
                    "A/B lever for the compacted opaque worklist)")
    ap.add_argument("--fit-scale", type=int, default=8,
                    help="downscale factor for the cap-fitting stats frame "
                    "(1 = exact fit at full size; only feasible on TPU)")
    ap.add_argument("--scene", default="all_passes",
                    choices=["all_passes", "headline"],
                    help="all_passes: full rung ladder; headline: the "
                    "sphere scene (~23%% opaque coverage — where the "
                    "compacted opaque shade engages), opaque rung only")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import functools

    import superconductor_tpu as sc
    from superconductor_tpu.render.frame import render_frame_impl

    import bench

    scene_fn = (bench.all_passes_scene if args.scene == "all_passes"
                else bench.headline_scene)
    dev, build, full_config, env = scene_fn(sc, width, height)
    state0 = build(0.0)
    if args.fit_scale <= 1:
        full_config = bench.fit_caps(dev, state0, full_config, env)
    else:
        # Downscaled fit: a full-size stats EXECUTION is infeasible on CPU
        # (the ref raster is O(t_cap*H*W)), so:
        #   - pairs: computed EXACTLY at full size from binning alone
        #     (O(T) geometry + bbox tile counts, no raster); all-triangle
        #     superset >= any per-pass max, safe.
        #   - pixel coverage caps (opaque/shade): one stats frame at
        #     (w/s, h/s), scaled by the area ratio (coverage fractions are
        #     resolution-invariant).
        #   - blend_layers (a per-pixel layer count): resolution-
        #     independent, transferred as fitted.
        from superconductor_tpu.ecs.systems import _next_pow2
        from superconductor_tpu.ops.binning import bin_triangles
        from superconductor_tpu.render.frame import (
            _merged_geometry,
            render_frame_stats,
            size_worklist_cap,
        )

        s = args.fit_scale
        sw, sh = width // s, height // s
        from superconductor_tpu.render.frame import stats_to_host

        sdev, sbuild, sconfig, senv = scene_fn(sc, sw, sh)
        sconfig = bench.fit_caps(sdev, sbuild(0.0), sconfig, senv)
        _, st = render_frame_stats(sdev, sbuild(0.0), sconfig, senv)
        st = stats_to_host(st)
        area = (width * height) / float(sw * sh)

        tri, _ = _merged_geometry(
            dev, state0, state0.uniforms["view_proj"][0], full_config
        )
        pairs_full = int(
            bin_triangles(tri, width, height, full_config.p_cap).num_pairs
        )
        full_config = bench.replace_config(
            full_config,
            p_cap=_next_pow2(pairs_full * 2),
            blend_layers=sconfig.blend_layers,
            clip_layers=sconfig.clip_layers,
            particle_layers=sconfig.particle_layers,
            shade_px_cap=size_worklist_cap(int(st["shade_px_needed"] * area)),
            shade_px_caps=tuple(
                size_worklist_cap(int(n * area))
                for n in st["shade_px_needed_k"]
            ) if st.get("shade_px_needed_k") else None,
            opaque_px_cap=size_worklist_cap(
                int(max(st["opaque_px_needed"], 1) * area)
            ),
        )
        print(json.dumps({"fit": {
            "scale": s, "small_stats": st, "pairs_full_exact": pairs_full,
            "p_cap": full_config.p_cap,
            "blend_layers": full_config.blend_layers,
            "shade_px_cap": full_config.shade_px_cap,
            "shade_px_caps": list(full_config.shade_px_caps or ()),
            "opaque_px_cap": full_config.opaque_px_cap,
        }}), flush=True)
    if args.raster:
        full_config = replace(full_config, raster=args.raster)
    if args.opaque_cap is not None:
        full_config = replace(full_config, opaque_px_cap=args.opaque_cap)

    rungs = [
        ("opaque", dict(enable_clip=False, enable_blend=False,
                        enable_lines=False, enable_particles=False)),
        ("+clip", dict(enable_blend=False, enable_lines=False,
                       enable_particles=False)),
        ("+blend", dict(enable_lines=False, enable_particles=False)),
        ("+lines", dict(enable_particles=False)),
        ("+particles(full)", {}),
    ]
    if args.scene == "headline":
        rungs = rungs[:1]  # the headline scene has no transparent content

    results = []
    prev = None
    for name, overrides in rungs:
        config = replace(full_config, **overrides)
        step = functools.partial(render_frame_impl, config=config, env=env)
        compiled = jax.jit(step).lower(dev, state0).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        row = {
            "rung": name,
            "gflops": round(ca.get("flops", 0.0) / 1e9, 3),
            "gbytes": round(ca.get("bytes accessed", 0.0) / 1e9, 3),
        }
        if prev is not None:
            row["d_gflops"] = round(row["gflops"] - prev["gflops"], 3)
            row["d_gbytes"] = round(row["gbytes"] - prev["gbytes"], 3)
        prev = row
        results.append(row)
        print(json.dumps(row), flush=True)

    px = width * height
    print(json.dumps({
        "size": f"{width}x{height}",
        "backend": args.backend,
        "flops_per_px_full": round(results[-1]["gflops"] * 1e9 / px, 1),
        "bytes_per_px_full": round(results[-1]["gbytes"] * 1e9 / px, 1),
    }))


if __name__ == "__main__":
    main()
