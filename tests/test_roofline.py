"""Roofline probe/prediction machinery (utils/roofline.py).

The executor ceilings themselves are device measurements (tools/
roofline.py on TPU); these tests pin the accounting and estimator logic
on CPU with tiny programs.
"""

import jax
import jax.numpy as jnp
import pytest

from superconductor_tpu.utils.roofline import (
    _dispatch_slope_ms,
    _probe,
    predict_ms,
    program_costs,
)


def test_program_costs_counts_flops_and_bytes():
    a = jnp.ones((64, 64), jnp.float32)

    compiled = jax.jit(lambda a: a @ a).lower(a).compile()
    flops, bytes_ = program_costs(compiled)
    # 2*n^3 matmul flops (cost model may add epsilon); operands+result
    assert flops >= 2 * 64**3 * 0.9
    assert bytes_ >= 2 * 64 * 64 * 4  # at least in+out


def test_dispatch_slope_positive_and_bracketed():
    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda x: x @ x)

    ms, checks = _dispatch_slope_ms(lambda: f(x), ns=(1, 4, 8), calls=2)
    assert ms > 0
    assert len(checks) == 2


def test_probe_returns_selfconsistent_rates():
    def make():
        # big enough that the dispatch slope is well above timer noise
        x = jnp.ones((1 << 22,), jnp.float32)

        def run(x):
            return x * 2.0 + 1.0

        return run, (x,)

    p = _probe(make, ns=(1, 8), calls=3)
    assert p["flops"] > 0 and p["bytes"] > 0
    if p["ms_per_dispatch"] > 0:  # CPU timer noise can still go negative
        # rate must equal numerator / measured time by construction
        assert p["gbps"] == pytest.approx(
            p["bytes"] / (p["ms_per_dispatch"] * 1e-3) / 1e9
        )


def test_predict_ms_band_ordering():
    ceil = {"matmul_tflops": 1.0, "stream_gbps": 10.0, "gather_gbps": 1.0}
    pred = predict_ms(flops=1e9, bytes_=1e9, ceilings=ceil)
    # stream-bound lo: 1 GB / 10 GB/s = 100 ms; gather hi: 1000 ms;
    # compute floor 1 ms
    assert pred["pred_lo_ms"] == pytest.approx(100.0)
    assert pred["pred_hi_ms"] == pytest.approx(1000.0)
    assert pred["pred_lo_ms"] <= pred["pred_hi_ms"]
    # compute-bound case: flops dominate both ends
    pred2 = predict_ms(flops=1e13, bytes_=1e6, ceilings=ceil)
    assert pred2["pred_lo_ms"] == pred2["pred_hi_ms"] == pytest.approx(1e4)
