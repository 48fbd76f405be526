#!/usr/bin/env python3
"""Characterize the executor's gather path (TPU).

The deferred shade is gather-ROW-bound (docs/TIMING.md round-4
re-characterization): random row gathers measured ~120-215 Mrows/s
"width-erratic". Every optimization decision now hinges on WHAT sets
that rate, so this probe sweeps the axes the frame design can actually
exploit:

  * row width          — 8..208 bytes-per-row equivalents (f32 and u8
                         pools): is a 208 B interleaved material row as
                         cheap as a 32 B one?
  * table size         — 1 MB (VMEM-resident), 64 MB (cache?), 512 MB
                         (HBM): does residency change the rate?
  * index locality     — uniform random vs sorted vs tile-coherent: do
                         HBM row-buffer hits / cache lines matter, i.e.
                         is sorting worklists by uv worth anything?
  * concurrency        — 1 gather chain vs 4 independent interleaved
                         chains: does the issue pipeline overlap
                         independent gathers?

Methodology: dispatch-count slope with readback barriers (docs/TIMING.md
rules) — each variant is a c-chained gather program; time(k*c) vs
time(c) slope cancels RTT + dispatch. Chains are kept dependent through
the INDEX vector (cheap xor) so XLA cannot CSE or reorder the gathers,
while the table stays cold-ish.

Usage: python tools/gather_probe.py [--rows 20] [--calls 3] [--quick]
Prints one JSON line per variant and a summary table.
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
    ap.add_argument("--rows", type=int, default=20,
                    help="log2 of gathered rows per link (default 2^20)")
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4,
                    help="gathers chained per dispatch")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run ONLY these variants: comma-separated "
                         "dtype:rowbytes:tableMB[:kind[:chains]] specs, "
                         "e.g. 'u8:64:45,u8:128:45,u8:256:90' (the matq "
                         "row-width question)")
    ap.add_argument("--computed", action="store_true",
                    help="materialize the table INSIDE the program "
                         "(table * (1+eps)) before gathering — tests "
                         "whether XLA-chosen layouts of computed tables "
                         "gather slower than device_put inputs (the "
                         "in-frame vs standalone gather gap)")
    args = ap.parse_args()

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    P = 1 << (args.rows if not args.quick else args.rows - 2)
    C = args.chain

    def timed_slope(fn_k1, fn_k2, calls):
        """Median over `calls` of (t(k2) - t(k1)) where k2 = 2*k1 chains."""
        def run(fn):
            out = fn()
            # readback barrier: 4 bytes of the result must exist
            return jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])

        # compile both
        run(fn_k1), run(fn_k2)
        d1, d2 = [], []
        for _ in range(calls):
            t0 = time.perf_counter(); run(fn_k1); d1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(fn_k2); d2.append(time.perf_counter() - t0)
        d1.sort(); d2.sort()
        return (d2[len(d2) // 2] - d1[len(d1) // 2]) * 1e3  # ms per extra k1-worth

    rng = np.random.default_rng(0)

    def make_indices(m, kind):
        if kind == "random":
            return rng.integers(0, m, size=P).astype(np.int32)
        if kind == "sorted":
            return np.sort(rng.integers(0, m, size=P).astype(np.int32))
        if kind == "tile64":
            # 64-row coherent clusters at random bases (texture-tile-like)
            bases = rng.integers(0, max(m - 64, 1), size=P // 64 + 1)
            idx = (bases[:, None] + np.arange(64)[None, :]).reshape(-1)[:P]
            return idx.astype(np.int32)
        raise ValueError(kind)

    # Trimmed to the 8 decision-relevant points (each costs 2 remote
    # compiles through the tunnel; a full sweep would take an hour).
    variants = [
        ("f32", 16, (1 << 26) // 64, "random", 1),    # baseline
        ("f32", 128, (1 << 26) // 512, "random", 1),  # wide f32
        ("u8", 208, (1 << 26) // 208, "random", 1),   # interleaved-mat row
        ("f32", 16, (1 << 20) // 64, "random", 1),    # 1 MB (VMEM-class)
        ("f32", 16, (512 << 20) // 64, "random", 1),  # 512 MB HBM
        ("f32", 16, (256 << 20) // 64, "sorted", 1),
        ("f32", 16, (256 << 20) // 64, "tile64", 1),
        ("f32", 16, (1 << 26) // 64, "random", 4),    # 4 independent chains
    ]
    if args.only:
        variants = []
        for spec in args.only.split(","):
            parts = spec.split(":")
            dtype, rb, mb = parts[0], int(parts[1]), float(parts[2])
            kind = parts[3] if len(parts) > 3 else "random"
            par = int(parts[4]) if len(parts) > 4 else 1
            lane = 4 if dtype == "f32" else 1
            w = rb // lane
            m = int(mb * (1 << 20)) // rb
            variants.append((dtype, w, m, kind, par))

    results = []
    for dtype, w, m, kind, par in variants:
        # Tables and indices are ARGUMENTS of the jitted function, never
        # closures: a closed-over table is a compile-time constant and
        # XLA folds the whole gather chain away (measured: "10.9 Grows/s"
        # and negative slopes before this fix — docs/TIMING.md rule 3).
        if dtype == "f32":
            table = jax.device_put(rng.random((m, w), dtype=np.float32))
        else:
            table = jax.device_put(
                rng.integers(0, 255, size=(m, w), dtype=np.uint8)
            )
        idx0 = jax.device_put(make_indices(m, kind))

        def make(k, m=m, par=par, kind=kind, table=table, idx0=idx0):
            @jax.jit
            def f(table, idx0):
                if args.computed:
                    # Materialize a COMPUTED copy of the table before the
                    # gather chain — XLA picks this buffer's layout. The
                    # barrier stops the elementwise op from fusing into
                    # the gather (which would only touch gathered rows).
                    if table.dtype == jnp.uint8:
                        table = jax.lax.optimization_barrier(
                            table ^ jnp.uint8(0)
                        )
                    else:
                        table = jax.lax.optimization_barrier(
                            table * jnp.float32(1.0000001)
                        )
                outs = []
                for p in range(par):
                    idx = (
                        jnp.bitwise_xor(idx0, p * 2654435761 & (2**31 - 1)) % m
                        if par > 1 else idx0
                    )
                    acc = jnp.zeros((), jnp.float32)
                    for _ in range(k):
                        rowsum = table[idx].astype(jnp.float32).sum(axis=-1)
                        acc = acc + rowsum.sum()
                        # thread dependency through indices, keep locality
                        # class: a data-dependent +1 step
                        bump = (rowsum[:1] > -1e30).astype(jnp.int32)[0]
                        idx = (
                            jnp.minimum(idx + bump, m - 1)
                            if kind != "random" else (idx + bump) % m
                        )
                    outs.append(acc)
                return jnp.stack(outs).sum()
            return lambda: f(table, idx0)

        slope_ms = timed_slope(make(C), make(2 * C), args.calls)
        rows = P * C * par
        mrps = rows / (slope_ms * 1e-3) / 1e6 if slope_ms > 0 else float("nan")
        bpr = w * (4 if dtype == "f32" else 1)
        gbps = rows * bpr / (slope_ms * 1e-3) / 1e9 if slope_ms > 0 else float("nan")
        rec = {
            "dtype": dtype, "width": w, "bytes_per_row": bpr,
            "table_mb": round(m * bpr / 2**20), "locality": kind,
            "parallel": par, "slope_ms": round(slope_ms, 2),
            "mrows_per_s": round(mrps, 1), "payload_gbps": round(gbps, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| dtype | B/row | table MB | locality | par | Mrows/s | GB/s |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['dtype']} | {r['bytes_per_row']} | {r['table_mb']} "
              f"| {r['locality']} | {r['parallel']} | {r['mrows_per_s']} "
              f"| {r['payload_gbps']} |")


if __name__ == "__main__":
    main()
