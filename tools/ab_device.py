#!/usr/bin/env python3
"""Quick device-time A/B probe for optimization work.

Measures one bench scene's true on-device frame time as a 2-point
unroll slope (t(k=2) - t(k=1)) with honest readback barriers
(docs/TIMING.md: block_until_ready races on the axon tunnel, so each
timed call is awaited by a 4-byte device_get of one pixel; the RTT and
dispatch floor are common-mode between the two endpoints and cancel).

Usage:
    python tools/ab_device.py --scene headline  --tag "my-change"
    python tools/ab_device.py --scene allpasses --tag "my-change"

Prints one JSON line: {"rung": tag, "device_ms": ..., "t1_ms": ...,
"t2_ms": ..., "spread": ...}. Compare device_ms before/after a change;
run-to-run spread on this executor is <1% (docs/TIMING.md), so >3%
deltas are real.
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
    ap.add_argument("--scene", default="headline",
                    choices=["headline", "allpasses"])
    ap.add_argument("--tag", default="ab")
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=3)
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import superconductor_tpu as sc
    import bench

    if args.scene == "headline":
        dev, build, config, env = bench.headline_scene(sc, width, height)
    else:
        dev, build, config, env = bench.all_passes_scene(sc, width, height)
    state0 = build(0.0)
    config = bench.fit_caps(dev, state0, config, env)

    fns = []
    for k in (1, 2):
        t0 = time.time()
        fn = bench.make_unrolled(dev, state0, config, env, k)
        bench._sync(fn())  # compile + settle
        print(f"# k={k} compiled+settled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        fns.append(fn)

    meds = []
    for fn in fns:
        ts = []
        for _ in range(args.calls):
            t0 = time.perf_counter()
            bench._sync(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        meds.append(ts[len(ts) // 2] * 1e3)
    t1, t2 = meds
    out = {
        "rung": args.tag,
        "scene": args.scene,
        "device_ms": round(t2 - t1, 1),
        "t1_ms": round(t1, 1),
        "t2_ms": round(t2, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
