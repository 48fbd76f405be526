#!/usr/bin/env python3
"""Profiler-measured on-device frame time for the bench scenes.

Why: every wall-clock metric on a tunneled TPU includes transport costs
whose floor drifts day to day (bench.py's device_ms min-of-windows was
measured drifting 0.17 -> 0.23 ms with no code change), and wrapping the
frame in lax.fori_loop to amortize dispatch compiles a DIFFERENT, far
slower program (the fused gather layouts are lost — 753 ms/frame vs
0.23 ms measured 2026-08-17). The XLA profiler's device trace gives the
honest per-frame on-device busy time of the REAL executable: this
captures N frames under jax.profiler.trace and sums the TPU plane's
XEvents.

CAVEAT (axon tunnel): jax.profiler.trace hangs at start_trace over the
tunneled axon backend (observed 2026-08-17; the trace dir is never
created) — this tool is for DIRECTLY ATTACHED TPUs. On the tunnel, the
shipping tunnel-proof metric is bench.py's unroll-delta
(`device_delta_ms`: t(2x-unrolled frame) - t(1x), transport costs
common-mode cancel).

Usage:
    python tools/device_time.py [--scene headline|all_passes|stereo]
                                [--frames 50] [--keep-trace DIR]
Prints one JSON line:
    {"scene", "frames", "device_busy_ms_per_frame", "plane", "events"}
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)

import numpy as np


def device_busy_ms(trace_dir):
    """Parse the xplane protos: per-device-plane sum of event durations.

    Returns {plane_name: busy_ms} for planes that look like accelerator
    devices (TPU/device planes; host threads are skipped)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    out = {}
    for f in glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ):
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            name = plane.name
            if not ("TPU" in name or "/device:" in name or "Device" in name):
                continue
            # Busy time := union of event intervals per line, summed over
            # lines, NOT the plain sum — XLA planes nest events (module >
            # fusion > op), so a plain sum double-counts parents.
            total_ps = 0
            n_events = 0
            for line in plane.lines:
                ivals = sorted(
                    (e.offset_ps, e.offset_ps + e.duration_ps)
                    for e in line.events
                )
                n_events += len(line.events)
                cur_s = cur_e = None
                for s, e in ivals:
                    if cur_e is None:
                        cur_s, cur_e = s, e
                    elif s <= cur_e:
                        cur_e = max(cur_e, e)
                    else:
                        total_ps += cur_e - cur_s
                        cur_s, cur_e = s, e
                if cur_e is not None:
                    total_ps += cur_e - cur_s
            if n_events:
                out[name] = {
                    "busy_ms": total_ps / 1e9,
                    "events": n_events,
                    "lines": len(plane.lines),
                }
    return out


def build_scene(which):
    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import superconductor_tpu as sc
    import bench as B

    if which == "headline":
        cap = {}

        def fm(frame_fn, device_fn=None, **kw):
            img = frame_fn(0.0)
            img.block_until_ready()
            cap["fn"] = device_fn
            return {
                "fps": 0.0, "compile_s": 0.0, "img": img, "device_ms": None,
                "device_spread": None, "loop_ms": None, "loop_fn": None,
                "loop_iters": 0,
            }

        orig = B._measure
        B._measure = fm
        try:
            B.bench_headline(sc)
        finally:
            B._measure = orig
        return cap["fn"]
    if which == "all_passes":
        dev, build, config, env = B.all_passes_scene(sc)
        state0 = build(0.0)
        return lambda: sc.render_frame(dev, state0, config, env)
    raise SystemExit(f"unknown scene {which}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="headline",
                    choices=("headline", "all_passes"))
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--keep-trace", default=None)
    args = ap.parse_args()

    import jax

    fn = build_scene(args.scene)
    fn().block_until_ready()  # compile outside the trace
    for _ in range(3):
        fn().block_until_ready()  # settle

    tdir = args.keep_trace or tempfile.mkdtemp(prefix="sc_xplane_")
    with jax.profiler.trace(tdir):
        img = None
        for _ in range(args.frames):
            img = fn()
        img.block_until_ready()

    planes = device_busy_ms(tdir)
    if not args.keep_trace:
        shutil.rmtree(tdir, ignore_errors=True)
    best = max(planes.items(), key=lambda kv: kv[1]["busy_ms"], default=None)
    out = {"scene": args.scene, "frames": args.frames}
    if best is None:
        out["error"] = "no device plane found in trace"
    else:
        name, info = best
        out["device_busy_ms_per_frame"] = round(
            info["busy_ms"] / args.frames, 4
        )
        out["plane"] = name
        out["events"] = info["events"]
        out["all_planes"] = {
            k: round(v["busy_ms"] / args.frames, 4) for k, v in planes.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
