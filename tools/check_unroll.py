#!/usr/bin/env python3
"""Prove bench.py's unroll-delta executables really contain k frames.

The unroll-delta metric (bench.py make_unrolled / measure_device_delta)
is only meaningful if XLA did NOT common-subexpression-fold the k frame
copies back into one — which it silently did in an earlier revision
whose +i*1e-12 perturbation underflowed f32. This tool compiles the
k=1/2/4 headline executables at a small size and reports their
compiled-FLOP counts; PASS requires flops(k=4)/flops(k=1) >= 3.0 (a fold gives ~1.0; observed 3.49 —
the gap to 4.0 is k-independent fixed work).

Usage: python tools/check_unroll.py [--size 256x256]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x256")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import superconductor_tpu as sc
    import bench as B

    orig = B._measure

    def fm(frame_fn, device_fn=None, **kw):
        img = frame_fn(0.0)
        img.block_until_ready()
        return {"fps": 0.0, "compile_s": 0.0, "img": img,
                "device_ms": None, "device_spread": None}

    B._measure = fm
    try:
        r = B.bench_headline(sc, width=width, height=height)
    finally:
        B._measure = orig

    flops = {}
    for k, f in r["delta_fns"]:
        ca = f.lowered().compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops[k] = float(ca.get("flops", 0.0))
    ratio = flops[4] / flops[1] if flops[1] else 0.0
    print(json.dumps({
        "flops_k1": flops[1], "flops_k2": flops[2], "flops_k4": flops[4],
        "ratio_4_1": round(ratio, 3),
        "pass": ratio >= 3.0,
    }))
    sys.exit(0 if ratio >= 3.0 else 1)


if __name__ == "__main__":
    main()
