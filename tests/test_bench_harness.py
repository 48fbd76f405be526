"""Unit tests for bench.py's honest-timing harness (no device needed).

The unroll-count-slope estimator (docs/TIMING.md) is the round-over-round
regression metric; these tests pin its arithmetic with mock "executables"
whose cost is a known sleep, so a refactor that breaks slope/check/budget
logic fails fast on CPU."""

import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench


PER_COPY_MS = 60.0  # coarse enough that scheduler sleep-overshoot
TOL_MS = 20.0  # (a few ms under load) stays well inside tolerance


def _mk(k, fixed_s=0.010):
    """Mock unrolled executable: k frame copies + fixed per-program cost."""

    def f():
        time.sleep(fixed_s + PER_COPY_MS * 1e-3 * k)
        return np.zeros((1, 4, 4, 4), np.uint8)

    return f


def test_slope_three_point():
    r = {"tag": "t3", "delta_fns": ((1, _mk(1)), (2, _mk(2)), (4, _mk(4)))}
    bench.measure_device_delta([r], calls=3, repeats=3)
    # slope recovers the per-copy cost, cancelling the fixed cost
    assert abs(r["delta_ms"] - PER_COPY_MS) < TOL_MS, r["delta_ms"]
    assert len(r["delta_check_ms"]) == 2
    for d in r["delta_check_ms"]:
        assert abs(d - PER_COPY_MS) < 2 * TOL_MS, r["delta_check_ms"]
    assert r["rtt_ms"] < 50.0


def test_slope_two_point():
    r = {"tag": "t2", "delta_fns": ((1, _mk(1)), (2, _mk(2)))}
    bench.measure_device_delta([r], calls=3, repeats=3)
    assert abs(r["delta_ms"] - PER_COPY_MS) < TOL_MS, r["delta_ms"]
    assert len(r["delta_check_ms"]) == 1


def test_budget_skips_and_marks():
    calls = []

    def spy():
        calls.append(1)
        return np.zeros((1, 4, 4, 4), np.uint8)

    r = {"tag": "tb", "delta_fns": ((1, spy), (2, spy))}
    bench.measure_device_delta(
        [r], budget_s=1.0, t_start=time.time() - 10.0
    )
    assert r["delta_error"] == "skipped: bench budget"
    assert "delta_ms" not in r
    assert not calls  # never dispatched


def test_delta_error_reported_not_raised():
    def boom():
        raise RuntimeError("device fell over")

    r = {"tag": "te", "delta_fns": ((1, boom), (2, boom))}
    bench.measure_device_delta([r])
    assert r["delta_error"].startswith("RuntimeError")


def test_fit_caps_grows_all_four(monkeypatch):
    """fit_caps must right-size p_cap/blend_layers/shade_px_cap/
    opaque_px_cap from the stats frame before any timing, so no bench rung
    measures a frame that silently drops work (the never-drop contract of
    ecs/systems.py)."""
    from superconductor_tpu.render import frame as frame_mod
    from superconductor_tpu.render.frame import RenderConfig

    calls = []

    def fake_stats(dev, state, config, env):
        calls.append(config)
        # first frame: everything overflows; after growth: all within caps
        stats = {"pairs_needed": 100_000, "layers_needed": 6,
                 "shade_px_needed": 200_000, "opaque_px_needed": 150_000}
        if len(calls) > 1:
            assert config.p_cap >= 100_000
            assert config.blend_layers >= 6
            assert config.shade_px_cap >= 200_000
            assert config.opaque_px_cap >= 150_000
        return None, stats

    monkeypatch.setattr(frame_mod, "render_frame_stats", fake_stats)
    cfg = RenderConfig(p_cap=1 << 16, blend_layers=4, shade_px_cap=1 << 17,
                       opaque_px_cap=1 << 17)
    out = bench.fit_caps("dev", "state", cfg, "env")
    # grown to next_pow2(100000 * 2) = 2^18, then tightened on the first
    # clean frame to size_worklist_cap(100000) (binning sorts p_cap rows
    # live or not, so the overshoot taxes every raster pass)
    assert out.p_cap == 114688  # size_worklist_cap(100000): 28*2^12
    assert out.blend_layers == 8  # next_pow2(6)
    assert out.shade_px_cap == 229376  # size_worklist_cap(200000): 28*2^13
    assert out.opaque_px_cap == 172032  # size_worklist_cap(150000): 21*2^13
    assert len(calls) == 3  # grew, tightened p_cap, then clean stats frame


def test_size_worklist_cap():
    """Sixteenth-pow2 sizing with 1.125x margin: covers the need, never
    overshoots it by more than ~1.22x. Every dead lane is paid every
    frame (~35 ns/lane measured r5: cutting the headline's cap 917504 ->
    655360 took 45.2 -> 36.1 ms), so the margin is deliberately thin;
    undershoot costs one re-render+recompile via the growth loop."""
    from superconductor_tpu.render.frame import size_worklist_cap

    assert size_worklist_cap(0) == 512
    assert size_worklist_cap(300) == 512  # floor
    for need in (1000, 4096, 563_874, 1_047_557, 123_456_789):
        cap = size_worklist_cap(need)
        assert cap >= need * 1.125 - 1
        assert cap <= need * 1.23
        # sixteenth-pow2 boundary: at most 5 significant bits
        assert cap % (1 << max(cap.bit_length() - 5, 0)) == 0, (need, cap)
    # the motivating case: the 1080p headline sphere's 563,874-px coverage
    # must size BELOW the 2,073,600-px screen (pow2-of-2x gave 2^21 above
    # it, silently reverting to the full-screen shade)
    assert size_worklist_cap(563_874) < 1920 * 1080
