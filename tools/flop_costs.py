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

    dev, build, full_config, env = bench.all_passes_scene(sc, width, height)
    state0 = build(0.0)
    full_config = bench.fit_caps(dev, state0, full_config, env)
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
