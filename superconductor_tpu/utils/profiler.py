"""Frame profiling helpers.

The reference has no profiling beyond log lines (SURVEY.md §5); production
TPU rendering wants more: wall-clock pass timing on the host and the XLA
profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class FrameProfiler:
    """Accumulates named host-side timings; cheap enough to leave on."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot * 1e3:.2f} ms total, {tot / n * 1e3:.3f} ms avg x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA device trace around a block (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def frame_capacity_report(state, tri_num_valid: int, bins_num_pairs: int, config) -> List[str]:
    """Overflow diagnostics: capacities are static under jit, so overflows
    silently drop triangles — the host should check these once per scene
    change (the analog of the reference's buffer-growth logs)."""
    warnings = []
    if tri_num_valid > config.t_cap:
        warnings.append(
            f"triangle capacity exceeded: {tri_num_valid} > t_cap={config.t_cap}; "
            "increase RenderConfig.t_cap"
        )
    if bins_num_pairs > config.p_cap:
        warnings.append(
            f"bin pair capacity exceeded: {bins_num_pairs} > p_cap={config.p_cap}; "
            "increase RenderConfig.p_cap"
        )
    return warnings
