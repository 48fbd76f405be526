#!/usr/bin/env python3
"""Per-pass roofline: predicted vs measured pass times (TPU).

Closes the evidence gap in the "at-spec" extrapolation (docs/TIMING.md):
instead of applying a whole-machine spec ratio to a gather-bound frame,
this tool
  1. measures the executor's own ceilings (matmul TFLOP/s, streaming
     HBM GB/s, random-gather GB/s) with the honest dispatch-count-slope
     methodology (superconductor_tpu/utils/roofline.py),
  2. reads each pass rung's compiled FLOPs + bytes accessed from the
     TPU executable's cost_analysis (same rung ladder as
     tools/pass_costs.py, full XLA fusion),
  3. predicts each rung's incremental time as a band
     [bytes/stream_bw, bytes/gather_bw] (with the compute floor), and
  4. compares against measured rung deltas — either re-measured here
     (default; the programs are compile-cache hits after a pass_costs
     run) or supplied via --measured '{"opaque": 848.7, ...}'.

A measured delta inside (or within ~2x of) its band says the pass runs
as fast as this executor's memory system allows — and therefore scales
with the memory system, not with some unrelated resource, when moving
to real silicon.

Usage: python tools/roofline.py [--size 1920x1080] [--calls 3]
       [--measured JSON] [--scene all_passes|headline] [--skip-probes]
Prints one JSON line per step plus a markdown table for docs/TIMING.md.
"""

import argparse
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--scene", default="all_passes",
                    choices=["all_passes", "headline"])
    ap.add_argument("--measured", default=None,
                    help="JSON dict of rung->delta_ms (skip re-measuring)")
    ap.add_argument("--skip-probes", action="store_true",
                    help="reuse ceilings from --ceilings instead of probing")
    ap.add_argument("--ceilings", default=None,
                    help='JSON {"matmul_tflops":..,"stream_gbps":..,'
                    '"gather_gbps":..}')
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import functools

    import jax

    import bench
    import superconductor_tpu as sc
    from superconductor_tpu.render.frame import render_frame_impl
    from superconductor_tpu.utils.roofline import (
        predict_ms,
        probe_ceilings,
        program_costs,
    )

    # --- ceilings ---
    if args.skip_probes and args.ceilings:
        ceilings = json.loads(args.ceilings)
    else:
        t0 = time.time()
        ceilings = probe_ceilings(calls=args.calls)
        ceilings["probe_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps({"ceilings": {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in ceilings.items() if k != "probes"
    }}), flush=True)
    if "probes" in ceilings:
        for name, p in ceilings["probes"].items():
            print(json.dumps({"probe": name, **{
                k: (round(v, 3) if isinstance(v, float) else
                    [round(x, 3) for x in v] if isinstance(v, list) else v)
                for k, v in p.items()}}), flush=True)

    # --- scene + rungs (mirrors tools/pass_costs.py exactly) ---
    scene_fn = (bench.all_passes_scene if args.scene == "all_passes"
                else bench.headline_scene)
    dev, build, full_config, env = scene_fn(sc, width, height)
    state0 = build(0.0)
    full_config = bench.fit_caps(dev, state0, full_config, env)

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
        rungs = rungs[:1]

    measured = json.loads(args.measured) if args.measured else None

    rows = []
    prev_cost = (0.0, 0.0)
    prev_ms = 0.0
    for name, overrides in rungs:
        config = replace(full_config, **overrides)
        step = functools.partial(render_frame_impl, config=config, env=env)
        t0 = time.time()
        compiled = jax.jit(step).lower(dev, state0).compile()
        compile_s = time.time() - t0
        flops, bytes_ = program_costs(compiled)
        d_flops = flops - prev_cost[0]
        d_bytes = bytes_ - prev_cost[1]
        prev_cost = (flops, bytes_)

        if measured is not None:
            d_ms = measured.get(name)
        else:
            # re-measure with the pass_costs barrier (programs are
            # compile-cache hits; absolute includes ~1 RTT which cancels
            # in the delta)
            fn = functools.partial(compiled, dev, state0)
            jax.device_get(fn()[(0, 0, 0, 0)])  # settle
            ts = []
            for _ in range(args.calls):
                t0 = time.perf_counter()
                jax.device_get(fn()[(0, 0, 0, 0)])
                ts.append(time.perf_counter() - t0)
            ts.sort()
            ms = ts[len(ts) // 2] * 1e3
            d_ms = ms - prev_ms if prev_ms else ms
            prev_ms = ms

        pred = predict_ms(d_flops, d_bytes, ceilings)
        row = {
            "rung": name,
            "d_gflops": round(d_flops / 1e9, 3),
            "d_gbytes": round(d_bytes / 1e9, 3),
            "pred_lo_ms": round(pred["pred_lo_ms"], 1),
            "pred_hi_ms": round(pred["pred_hi_ms"], 1),
            "measured_ms": round(d_ms, 1) if d_ms is not None else None,
            "compile_s": round(compile_s, 1),
        }
        if d_ms:
            # where measured lands relative to the band
            if d_ms < pred["pred_lo_ms"]:
                row["vs_band"] = round(d_ms / pred["pred_lo_ms"], 2)
            elif d_ms > pred["pred_hi_ms"]:
                row["vs_band"] = round(d_ms / pred["pred_hi_ms"], 2)
            else:
                row["vs_band"] = 1.0  # inside the band
        rows.append(row)
        print(json.dumps(row), flush=True)

    # markdown for docs/TIMING.md
    print("\n| pass | ΔGFLOP | ΔGB | pred lo (stream) | pred hi (gather) "
          "| measured ms | vs band |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['rung']} | {r['d_gflops']} | {r['d_gbytes']} "
              f"| {r['pred_lo_ms']} | {r['pred_hi_ms']} "
              f"| {r['measured_ms']} | {r.get('vs_band', '—')} |")
    total_b = sum(r["d_gbytes"] for r in rows)
    total_ms = sum(r["measured_ms"] or 0.0 for r in rows)
    if total_ms:
        print(json.dumps({
            "frame_gbytes": round(total_b, 2),
            "frame_ms": round(total_ms, 1),
            "achieved_gbps": round(total_b / (total_ms * 1e-3), 3),
            "stream_bw_utilization": round(
                (total_b / (total_ms * 1e-3)) / ceilings["stream_gbps"], 3),
        }))


if __name__ == "__main__":
    main()
