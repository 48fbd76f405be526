#!/usr/bin/env python3
"""Does gather rate depend on the TABLE size or the touched FOOTPRINT?

The interleaved material pool is ~45 MB on the hero scene but a frame's
taps touch only the few hot mip levels (~a few MB). gather_probe.py
showed 1 MB tables gather ~2.5x faster than 64 MB ones with indices
random over the WHOLE table — this probe separates the two variables:
a fixed 64 MB u8 (N, 64) table gathered with indices restricted to a
{64 MB, 8 MB, 2 MB, 0.5 MB} leading range, vs a genuinely small 2 MB
table. If footprint (cache residency) sets the rate, packing hot mips
contiguously is enough; if table size does, the pool must shrink.

Methodology: dispatch-count slope, dependency-chained indices, tables as
jit arguments (docs/TIMING.md rules).

Usage: python tools/footprint_probe.py [--rows 20] [--calls 3]
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
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args()

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    P = 1 << args.rows
    C = args.chain
    rng = np.random.default_rng(0)

    def timed_slope(fn_k1, fn_k2, calls):
        def run(fn):
            return jax.device_get(
                jax.tree_util.tree_leaves(fn())[0].ravel()[0]
            )

        run(fn_k1), run(fn_k2)
        d1, d2 = [], []
        for _ in range(calls):
            t0 = time.perf_counter(); run(fn_k1); d1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(fn_k2); d2.append(time.perf_counter() - t0)
        d1.sort(); d2.sort()
        return (d2[len(d2) // 2] - d1[len(d1) // 2]) * 1e3

    W = 64  # u8 bytes per row (matq row)
    cases = [
        (64 << 20, 64 << 20, "64MB table, full footprint"),
        (64 << 20, 8 << 20, "64MB table, 8MB footprint"),
        (64 << 20, 2 << 20, "64MB table, 2MB footprint"),
        (64 << 20, 512 << 10, "64MB table, 0.5MB footprint"),
        (2 << 20, 2 << 20, "2MB table, full footprint"),
    ]
    for table_bytes, foot_bytes, label in cases:
        m = table_bytes // W
        fp = max(foot_bytes // W, 1)
        table = jax.device_put(
            rng.integers(0, 255, size=(m, W), dtype=np.uint8)
        )
        idx0 = jax.device_put(rng.integers(0, fp, size=P).astype(np.int32))

        def make(k, m=m, fp=fp, table=table, idx0=idx0):
            @jax.jit
            def f(table, idx0):
                idx = idx0
                acc = jnp.zeros((), jnp.float32)
                for _ in range(k):
                    rowsum = table[idx].astype(jnp.float32).sum(axis=-1)
                    acc = acc + rowsum.sum()
                    bump = (rowsum[:1] > -1e30).astype(jnp.int32)[0]
                    idx = (idx + bump) % fp
                return acc
            return lambda: f(table, idx0)

        slope_ms = timed_slope(make(C), make(2 * C), args.calls)
        rows = P * C
        mrps = rows / (slope_ms * 1e-3) / 1e6 if slope_ms > 0 else float("nan")
        print(json.dumps({
            "case": label, "slope_ms": round(slope_ms, 2),
            "mrows_per_s": round(mrps, 1),
            "ns_per_row": round(slope_ms * 1e6 / rows, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
