"""Executor ceiling probes + program cost accounting for rooflines.

The reference renderer states its performance intent qualitatively
(README "Features and limitations": low-overhead rendering); this
module is the rebuild's quantitative version: measure what the executor
actually delivers (matmul FLOP/s, streaming HBM GB/s, random-gather
GB/s), read what a compiled frame program actually consumes (XLA
cost_analysis FLOPs + bytes accessed), and predict pass times as

    pred_ms = max(flops / F_ceiling, bytes / B_ceiling)

so measured pass times can be checked against a defensible model
instead of a whole-machine spec ratio (docs/TIMING.md "Executor
characterization").

Timing follows the repo's honest-barrier rules (docs/TIMING.md):
- every timed call ends in a 4-byte `jax.device_get` readback
  (`block_until_ready` races on the axon tunnel);
- each probe reports a dispatch-count SLOPE of ONE compiled program
  (t(n) = fixed + n*work), cancelling RTT and the dispatch floor with
  no per-k compile variance;
- the numerator (FLOPs / bytes) comes from the SAME program's
  cost_analysis, so ceiling and prediction use one accounting scheme.

Probes are deliberately shaped like the frame's hot loops:
- matmul: bf16 chained square matmuls (MXU ceiling, like the vertex
  transform);
- stream: chained elementwise map over a large f32 array with
  optimization_barriers between stages so XLA cannot fuse the chain
  into one memory pass (VPU/HBM streaming ceiling, like the raster
  tile ops);
- gather: chained random-row gathers from a large table (the deferred
  shade is gather-bound — texture taps, setup/attr rows).
"""

from __future__ import annotations

import time
from functools import partial

__all__ = [
    "program_costs",
    "probe_ceilings",
    "predict_ms",
]


def _sync(arr):
    import jax

    return jax.device_get(arr[(0,) * arr.ndim])


def program_costs(compiled):
    """(flops, bytes_accessed) from an XLA compiled program."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _dispatch_slope_ms(fn, ns=(1, 2, 4), calls=3):
    """Per-dispatch time of ONE compiled program via the dispatch-count
    slope: dispatch n times back-to-back, one honest readback; the
    executor drains serially so t(n) = fixed + n*per_dispatch."""
    _sync(fn())  # settle any queue backlog

    def timed(n):
        ts = []
        for _ in range(calls):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn()
            _sync(o)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    t = [timed(n) for n in ns]
    slope = (t[-1] - t[0]) / (ns[-1] - ns[0])
    checks = [
        (t[i + 1] - t[i]) / (ns[i + 1] - ns[i]) for i in range(len(ns) - 1)
    ]
    return slope, checks


def _probe(make, ns, calls):
    """Compile one probe program, read its cost_analysis numerators,
    time its dispatch-count slope. Returns dict."""
    import jax

    run, args = make()
    lowered = jax.jit(run).lower(*args)
    compiled = lowered.compile()
    flops, bytes_ = program_costs(compiled)
    fn = partial(compiled, *args)
    ms, checks = _dispatch_slope_ms(fn, ns=ns, calls=calls)
    return {
        "ms_per_dispatch": ms,
        "check_ms": checks,
        "flops": flops,
        "bytes": bytes_,
        "tflops": flops / (ms * 1e-3) / 1e12 if ms > 0 else None,
        "gbps": bytes_ / (ms * 1e-3) / 1e9 if ms > 0 else None,
    }


def _make_matmul(c=32, n=4096):
    import jax
    import jax.numpy as jnp

    def make():
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

        def run(a, b):
            x = a
            for _ in range(c):
                x = x @ b  # chain is sequential; no CSE possible
            return x

        return run, (a, b)

    return make


def _make_stream(c=8, m=1 << 26):
    import jax
    import jax.numpy as jnp

    def make():
        x = jnp.ones((m,), jnp.float32)

        def run(x):
            for i in range(c):
                # barrier between stages: without it XLA fuses the whole
                # chain into ONE pass over memory and the probe measures
                # 1/c of the true traffic (verified via cost_analysis bytes)
                x = jax.lax.optimization_barrier(
                    x * jnp.float32(1.0 + 1e-6 * (i + 1)) + jnp.float32(1e-7)
                )
            return x

        return run, (x,)

    return make


def _make_gather(c=8, rows=1 << 20, width=32, m=1 << 21):
    import jax
    import jax.numpy as jnp

    def make():
        table = jnp.ones((rows, width), jnp.float32)
        idx = jax.random.randint(
            jax.random.PRNGKey(2), (m,), 0, rows, jnp.int32
        )

        def run(table, idx):
            out = None
            for i in range(c):
                g = jax.lax.optimization_barrier(
                    table[(idx + jnp.int32(i)) % rows]
                )
                out = g if out is None else jnp.maximum(out, g)
            return out

        return run, (table, idx)

    return make


def probe_ceilings(ns=(1, 2, 4), calls=3, quick=False):
    """Measure the executor's three ceilings. Returns a dict of probe
    results plus the headline numbers:

        {"matmul_tflops": ..., "stream_gbps": ..., "gather_gbps": ...,
         "gather_mrows_per_s": ..., "probes": {name: {...}}}

    quick=True uses smaller chain counts/arrays (for bench.py, where
    compile budget matters; the programs still dwarf the RTT floor).

    Probe sizing rules (each fixed after a mis-measurement, 2026-08-19):
    * matmul must CHAIN enough work that the slope dwarfs transport
      jitter — 8 chained 2048^2 matmuls are ~0.7 ms at spec and produced
      a NEGATIVE slope through the tunnel; 32 chained 4096^2 are ~22 ms
      and measure cleanly (194 TFLOP/s, bf16 v5e spec is ~197).
    * stream must NOT fit on-chip: a 64 MB array measured 1.9 TB/s
      (cache-resident, above the 819 GB/s HBM spec); 256 MB forces HBM
      and measures ~660 GB/s.
    * gather bandwidth must use PAYLOAD bytes (rows x width x 4 read +
      written), not XLA cost_analysis "bytes accessed", which counts
      the whole table per gather op; rows/s is the primary currency
      (the deferred shade is gather-ROW-bound, ~width-independent).
    """
    c = 8 if quick else 8
    makes = {
        "matmul": _make_matmul(c=8 if quick else 32, n=4096),
        "stream": _make_stream(c=c, m=(1 << 25) if quick else (1 << 26)),
        "gather": _make_gather(
            c=4,
            rows=(1 << 19) if quick else (1 << 20),
            width=8,
            m=(1 << 20) if quick else (1 << 21),
        ),
    }
    probes = {}
    for name, make in makes.items():
        probes[name] = _probe(make, ns=ns, calls=calls)
    # gather: payload accounting (see docstring); rows gathered per
    # dispatch = m * c, payload = rows * width * 4 bytes, read + written.
    g = probes["gather"]
    g_rows = ((1 << 20) if quick else (1 << 21)) * 4
    g_payload = g_rows * 8 * 4 * 2
    ms = g["ms_per_dispatch"]
    g["mrows_per_s"] = g_rows / (ms * 1e-3) / 1e6 if ms > 0 else None
    g["payload_gbps"] = g_payload / (ms * 1e-3) / 1e9 if ms > 0 else None
    g["gbps"] = g["payload_gbps"]  # override the cost_analysis figure
    return {
        "matmul_tflops": probes["matmul"]["tflops"],
        "stream_gbps": probes["stream"]["gbps"],
        "gather_gbps": g["payload_gbps"],
        "gather_mrows_per_s": g["mrows_per_s"],
        "probes": probes,
    }


def predict_ms(flops, bytes_, ceilings):
    """Roofline prediction band for a program of (flops, bytes):
    optimistic = all traffic at streaming bandwidth; pessimistic = all
    traffic at random-gather bandwidth; compute-bound floor from the
    matmul ceiling applies to both."""
    f = ceilings["matmul_tflops"] * 1e12
    bs = ceilings["stream_gbps"] * 1e9
    bg = ceilings["gather_gbps"] * 1e9
    t_flops = flops / f * 1e3 if f else 0.0
    lo = max(t_flops, bytes_ / bs * 1e3) if bs else t_flops
    hi = max(t_flops, bytes_ / bg * 1e3) if bg else t_flops
    return {"pred_lo_ms": lo, "pred_hi_ms": hi, "pred_flops_ms": t_flops}
