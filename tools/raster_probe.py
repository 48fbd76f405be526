#!/usr/bin/env python3
"""Isolate the Pallas raster kernel's cost structure on the real headline
bins (TPU).

The stage attribution (tools/stage_costs.py) puts raster at ~15 ms for
only ~8k binned pairs over 510 (32,128) tiles — far above its VPU math
(~1-2 ms). Candidate costs: per-grid-step fixed overhead (x510), the
DMA pipeline, and the full-screen sorted-pos -> pair-id remap gather.
This probe times, as dispatch-count slopes (docs/TIMING.md):

  * the pallas_call alone (sorted output, no remap) per tile shape;
  * the same kernel with an all-zero tile_count (pure per-step cost);
  * the remap gather alone (bins.order[vis.pair] at 1080p).

Usage: python tools/raster_probe.py [--size 1920x1080] [--tiles 32x128,64x256]
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
    ap.add_argument("--tiles", default="32x128,32x256,64x128,64x256,128x128")
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
    from superconductor_tpu.ops.raster_pallas import rasterize_pallas_sorted
    from superconductor_tpu.render.frame import _merged_geometry

    dev, build, config, env = B.headline_scene(sc, width, height)
    state = build(0.0)
    config = B.fit_caps(dev, state, config, env)

    tri, _ = jax.jit(
        lambda d, s: _merged_geometry(
            d, s, s.uniforms["view_proj"][0], config
        )
    )(dev, state)

    def slope(fn, args_, name, extra=None):
        t0 = time.time()
        out = fn(*args_)
        jax.device_get(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        compile_s = time.time() - t0
        meds = {n: [] for n in ns}
        for _ in range(args.calls):
            for n in ns:
                t0 = time.perf_counter()
                o = None
                for _ in range(n):
                    o = fn(*args_)
                o = o[0] if isinstance(o, tuple) else o
                jax.device_get(jnp.ravel(o)[0])
                meds[n].append(time.perf_counter() - t0)
        t = {n: sorted(v)[len(v) // 2] * 1e3 for n, v in meds.items()}
        n1, nl = ns[0], ns[-1]
        row = {"probe": name,
               "device_ms": round((t[nl] - t[n1]) / (nl - n1), 2),
               "compile_s": round(compile_s, 1)}
        if len(ns) >= 3:
            nm = ns[1]
            row["check_ms"] = [round((t[nm] - t[n1]) / (nm - n1), 2),
                               round((t[nl] - t[nm]) / (nl - nm), 2)]
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)
        return row["device_ms"]

    for ts in args.tiles.split(","):
        th, tw = map(int, ts.split("x"))
        bins = jax.jit(
            lambda tri: bin_triangles(
                tri, width, height, config.p_cap, tile_h=th, tile_w=tw
            ),
            static_argnames=(),
        )(tri)
        ss = jax.jit(gather_sorted_setup)(tri, bins)
        npairs = int(jax.device_get(bins.num_pairs))

        @jax.jit
        def raster(ss, tile_start, tile_count, i):
            vis = rasterize_pallas_sorted(
                ss * (1.0 + i * 1e-9), tile_start, tile_count,
                height, width, tile_h=th, tile_w=tw,
            )
            return vis.depth, vis.pair

        i0 = jnp.float32(0.0)
        slope(raster, (ss, bins.tile_start, bins.tile_count, i0),
              f"pallas[{ts}]", {"pairs": npairs})
        zero = jnp.zeros_like(bins.tile_count)
        slope(raster, (ss, bins.tile_start, zero, i0),
              f"pallas[{ts}] empty", {"tiles": int(
                  (-(-height // th)) * (-(-width // tw)))})

        if ts == args.tiles.split(",")[0]:
            vis = raster(ss, bins.tile_start, bins.tile_count, i0)

            @jax.jit
            def remap(pair, order, i):
                hit = pair >= (0 + i)
                return jnp.where(
                    hit, order[jnp.maximum(pair, 0)], -1
                )

            slope(remap, (vis[1], bins.order, jnp.int32(0)), "remap gather")


if __name__ == "__main__":
    main()
