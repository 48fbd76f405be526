#!/usr/bin/env python3
"""Per-pass device-cost attribution on the all-passes bench scene.

Times a ladder of configs that enable one pass family at a time
(opaque -> +clip -> +blend -> +lines -> +particles == the full
all-passes config). Each rung is its own jitted frame executable with
full XLA fusion, so the DELTA between rungs is the true fused
incremental cost of that pass — unlike timing stages standalone, which
loses the fused gather layouts (up to 100x off, see docs/KERNELS.md).

Timing uses the honest readback barrier (docs/TIMING.md):
block_until_ready races on the axon tunnel, so each call is awaited by
a 4-byte device_get of one pixel. Absolute rung times include one
transport RTT (~33 ms, printed), which cancels in rung deltas.

Usage:  python tools/pass_costs.py [--size 1920x1080] [--calls 3]
Prints one JSON line per rung plus a summary of deltas.

The scene keeps ALL content (clip/blend spheres, lines, particles) in
every rung; disabled passes drop their geometry, so a rung measures
"the frame without that pass's kernels", matching how the reference's
render_everything would skip a pass with nothing bound
(rendering.rs:506-558).
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

import numpy as np


def measure(device_fn, calls):
    """Median of `calls` dispatch+readback-barrier round trips (ms)."""
    import jax

    def sync():
        jax.device_get(device_fn()[(0, 0, 0, 0)])

    sync()  # settle (drains any queue backlog)
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        sync()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return med * 1e3, (times[-1] - times[0]) / med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=3)
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import superconductor_tpu as sc
    import bench

    dev, build, full_config, env = bench.all_passes_scene(sc, width, height)
    state0 = build(0.0)
    # Right-size the never-drop capacities (p_cap/blend_layers/shade_px_cap)
    # first — otherwise a rung could time a frame that silently drops work.
    full_config = bench.fit_caps(
        dev, state0, full_config, env,
        cache_key=bench._caps_cache_key(
            "allpasses", width, height,
            [os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          "tests", "fixtures", "dense_terrain.glb"),
             f"{bench.REF_ASSETS}/models/sponza_cubes.glb"]))

    import jax
    import jax.numpy as jnp

    x = jnp.zeros((4,), jnp.float32)
    jax.device_get(x[0])
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(x[0])
        rtts.append(time.perf_counter() - t0)
    print(json.dumps({"rtt_ms": round(sorted(rtts)[2] * 1e3, 1)}), flush=True)

    rungs = [
        ("opaque", dict(enable_clip=False, enable_blend=False,
                        enable_lines=False, enable_particles=False)),
        ("+clip", dict(enable_blend=False, enable_lines=False,
                       enable_particles=False)),
        ("+blend", dict(enable_lines=False, enable_particles=False)),
        ("+lines", dict(enable_particles=False)),
        ("+particles(full)", {}),
    ]

    # Compile every rung in parallel threads first (AOT — the remote
    # compile queue processes independent requests concurrently; measured
    # 6 programs in 88 s wall, docs/COMPILE.md), then measure serially.
    from concurrent.futures import ThreadPoolExecutor
    from superconductor_tpu.render.frame import render_frame

    def compile_rung(item):
        name, overrides = item
        config = replace(full_config, **overrides)
        t0 = time.time()
        render_frame.lower(dev, state0, config=config, env=env).compile()
        return name, config, time.time() - t0

    compiled = {}
    with ThreadPoolExecutor(max_workers=len(rungs)) as ex:
        for name, config, secs in ex.map(compile_rung, rungs):
            compiled[name] = (config, secs)
            print(f"# compiled {name} in {secs:.1f}s (parallel)",
                  file=sys.stderr, flush=True)

    results = []
    prev = None
    for name, _overrides in rungs:
        config, compile_s = compiled[name]
        ms, spread = measure(
            lambda: sc.render_frame(dev, state0, config, env), args.calls
        )
        row = {
            "rung": name,
            "device_ms": round(ms, 4),
            "spread": round(spread, 3),
            "delta_ms": None if prev is None else round(ms - prev, 4),
            "compile_s": round(compile_s, 1),
        }
        prev = ms
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "summary": {r["rung"]: r["delta_ms"] or r["device_ms"]
                    for r in results},
        "size": f"{width}x{height}",
    }))


if __name__ == "__main__":
    main()
