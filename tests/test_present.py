"""PresentQueue: the frames-in-flight pattern of demo/serve.py.

The reference's present loop runs against a real swapchain frame queue
(run_rendering_loop, /root/reference/src/lib.rs:420-564; wgpu's
desired_maximum_frame_latency default 2); PresentQueue reproduces the
queue semantics for JAX's async dispatch. These tests use fake frames
with a controllable clock, so they verify ordering, blocking points,
and latency accounting exactly — no device or compile involved.
"""

import pytest

from superconductor_tpu.render.present import PresentQueue


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class FakeFrame:
    """Records when it was blocked on; completing advances the clock."""

    def __init__(self, clock, render_time):
        self.clock = clock
        self.render_time = render_time
        self.blocked_at = None

    def block_until_ready(self):
        self.blocked_at = self.clock.t
        self.clock.t += self.render_time


def test_depth1_blocks_every_submit():
    clock = FakeClock()
    q = PresentQueue(depth=1, clock=clock)
    f = FakeFrame(clock, render_time=0.5)
    lat = q.submit(f)
    assert f.blocked_at == 0.0
    assert lat == pytest.approx(0.5)
    assert len(q) == 0


def test_depth2_fills_then_blocks_oldest_in_fifo_order():
    clock = FakeClock()
    q = PresentQueue(depth=2, clock=clock)
    frames = [FakeFrame(clock, 0.25) for _ in range(3)]

    assert q.submit(frames[0]) is None  # filling: no block yet
    assert frames[0].blocked_at is None
    assert len(q) == 1

    lat1 = q.submit(frames[1])  # queue full -> oldest completes
    assert frames[0].blocked_at is not None
    assert frames[1].blocked_at is None
    assert lat1 == pytest.approx(0.25)

    lat2 = q.submit(frames[2])
    assert frames[1].blocked_at is not None
    assert frames[2].blocked_at is None
    assert lat2 is not None

    rest = list(q.drain())
    assert frames[2].blocked_at is not None
    assert len(rest) == 1 and len(q) == 0


def test_latency_includes_queue_wait():
    clock = FakeClock()
    q = PresentQueue(depth=3, clock=clock)
    first = FakeFrame(clock, 1.0)
    q.submit(first)
    clock.t += 5.0  # host busy while the frame waits in the queue
    q.submit(FakeFrame(clock, 1.0))
    lat = q.submit(FakeFrame(clock, 1.0))
    # first submitted at t=0, completed at t=6 -> 6s, not 1s
    assert lat == pytest.approx(6.0)


def test_t_start_override_covers_input_phase():
    clock = FakeClock()
    q = PresentQueue(depth=1, clock=clock)
    t_input = clock.t
    clock.t += 0.2  # host draw-build between input and submit
    lat = q.submit(FakeFrame(clock, 0.3), t_start=t_input)
    assert lat == pytest.approx(0.5)


def test_depth_validation():
    with pytest.raises(ValueError):
        PresentQueue(depth=0)


def test_custom_sync_barrier_used_instead_of_block():
    """The axon tunnel needs a readback barrier (probe_sync) because
    block_until_ready can return before execution (docs/TIMING.md);
    PresentQueue must route completion through the injected sync."""
    clock = FakeClock()
    synced = []

    def fake_probe(frame):
        synced.append(frame)
        clock.t += 0.4

    q = PresentQueue(depth=1, clock=clock, sync=fake_probe)
    f = FakeFrame(clock, render_time=99.0)  # block would cost 99s
    lat = q.submit(f)
    assert synced == [f]
    assert f.blocked_at is None  # block_until_ready never called
    assert lat == pytest.approx(0.4)
