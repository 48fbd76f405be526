#!/usr/bin/env python3
"""Quick device-time A/B probe for optimization work.

Measures one bench scene's true on-device frame time as a DISPATCH-COUNT
slope of the production (k=1) frame executable: dispatch the same
compiled program n times back-to-back, then force completion with one
honest 4-byte readback (docs/TIMING.md: block_until_ready races on the
axon tunnel; a device_get of the last result cannot). The executor runs
its queue serially, so t(n) = fixed + n * frame, and the slope cancels
RTT and the dispatch floor.

Why not the k-fold UNROLL slope (bench.py's original rig)? Each unroll
count compiles a DIFFERENT executable, and XLA's compile quality varies
across them (measured 2026-08-19: the k=2 headline program ran ~2x the
per-frame cost of k=1/k=4 — brackets [297, 143] ms on the same code).
The dispatch-count slope uses ONE program — the very one production
dispatches — so there is nothing to vary: measured brackets agree to
~2% (175/182/177 ms). It is also ~3x cheaper to run (one compile).

Usage:
    python tools/ab_device.py --scene headline  --tag "my-change"
    python tools/ab_device.py --scene allpasses --tag "my-change"

Prints one JSON line with device_ms (the (t8-t1)/7 slope), the bracket
check [(t2-t1), (t8-t2)/6], and the raw medians.
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
    ap.add_argument("--ns", default="1,2,8",
                    help="comma-separated dispatch counts (>=2)")
    ap.add_argument("--row-chunks", type=int, default=0,
                    help="override RenderConfig.row_chunks (4K HBM bound)")
    ap.add_argument("--no-opaque-compact", action="store_true",
                    help="opaque_px_cap=None: full-screen opaque shade")
    ap.add_argument("--tile", default=None,
                    help="Pallas raster tile shape, e.g. 64x256")
    ap.add_argument("--opaque-cap", type=int, default=0,
                    help="override opaque_px_cap after fit_caps (margin A/B)")
    ap.add_argument("--granule", type=int, default=0,
                    help="override RenderConfig.granule_px (dilation A/B)")
    ap.add_argument("--pad", type=int, default=0,
                    help="override RenderConfig.shade_row_pad (alignment A/B)")
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
    if args.row_chunks:
        from dataclasses import replace

        config = replace(config, row_chunks=args.row_chunks)
    fixtures = {
        "headline": ["tests/fixtures/hero_helmet.glb"],
        "allpasses": ["tests/fixtures/dense_terrain.glb",
                      f"{bench.REF_ASSETS}/models/sponza_cubes.glb"],
    }[args.scene]
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    config = bench.fit_caps(
        dev, state0, config, env,
        cache_key=bench._caps_cache_key(
            args.scene, width, height,
            [f if os.path.isabs(f) else os.path.join(repo, f)
             for f in fixtures]))
    if args.no_opaque_compact:
        from dataclasses import replace

        config = replace(config, opaque_px_cap=None)
    if args.tile:
        from dataclasses import replace

        th, tw = map(int, args.tile.split("x"))
        config = replace(config, tile_h=th, tile_w=tw)
    if args.opaque_cap:
        from dataclasses import replace

        config = replace(config, opaque_px_cap=args.opaque_cap)
    if args.pad:
        from dataclasses import replace

        config = replace(config, shade_row_pad=args.pad)
    if args.granule:
        from dataclasses import replace

        # Caps were fitted at the cached granule size; re-fit the opaque
        # cap for this granule's dilation from one stats frame (reset it
        # first — fit_caps only grows it, and a 128-granule cap would
        # bury a smaller granule's win under dead margin lanes).
        config = replace(config, granule_px=args.granule, opaque_px_cap=None)
        config = bench.fit_caps(dev, state0, config, env)

    t0 = time.time()
    fn = bench.make_unrolled(dev, state0, config, env, 1)
    bench._sync(fn())  # compile + settle
    print(f"# compiled+settled in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    ns = tuple(int(n) for n in args.ns.split(","))
    meds = {n: [] for n in ns}
    for _ in range(args.calls):  # interleave against executor drift
        for n in ns:
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            bench._sync(out)
            meds[n].append(time.perf_counter() - t0)
    t = {n: sorted(v)[len(v) // 2] * 1e3 for n, v in meds.items()}
    out = {"rung": args.tag, "scene": args.scene}
    n1, nl = ns[0], ns[-1]
    out["device_ms"] = round((t[nl] - t[n1]) / (nl - n1), 1)
    if len(ns) >= 3:
        nm = ns[1]
        out["check_ms"] = [
            round((t[nm] - t[n1]) / (nm - n1), 1),
            round((t[nl] - t[nm]) / (nl - nm), 1),
        ]
    out.update({f"t{n}_ms": round(v, 1) for n, v in t.items()})
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
