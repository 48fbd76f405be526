"""Present queue: the swapchain frames-in-flight pattern for a TPU host.

The reference presents through a real swapchain whose frame queue lets
the CPU record frame n+1 while the GPU renders frame n (wgpu's
desired_maximum_frame_latency, default 2). A TPU host has no swapchain,
but JAX dispatch is asynchronous, so the same overlap falls out of
simply NOT blocking on a frame's output until `depth` newer frames have
been submitted: host draw-build of the next frames proceeds while the
device works through the queue.

Latency accounting is honest: a frame's latency is measured from its
submit() call to the moment its buffer is known ready — queue wait is
included, exactly what a user would feel between input and photon.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Iterator, Optional, Tuple


def probe_sync(frame) -> None:
    """Honest completion barrier: read back one texel of the frame.

    On the tunneled axon platform, block_until_ready() called right
    after a dispatch can return without waiting (docs/TIMING.md) — a
    present loop timed with it reports dispatch rate, not render rate.
    A device_get of a single pixel cannot return until the frame
    actually executed; it costs one transport RTT (~33 ms on the
    tunnel, negligible on a directly attached device)."""
    import jax

    jax.device_get(frame[(0,) * frame.ndim])


def block_sync(frame) -> None:
    """block_until_ready barrier — correct on directly attached devices;
    see probe_sync for why it is not sufficient on the axon tunnel."""
    frame.block_until_ready()


class PresentQueue:
    """Bounded queue of in-flight frames.

    submit(frame) enqueues a device buffer stamped with the current
    time; once more than `depth - 1` frames are queued, the oldest is
    waited on (via `sync`, default block_sync — pass probe_sync on the
    axon tunnel for honest latency) and its submit->ready latency in
    seconds is returned (None while filling). drain() syncs out the
    remainder, e.g. before a readback or at the end of a timed run.
    """

    def __init__(self, depth: int = 2, clock=time.time, sync=block_sync):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.depth = depth
        self._clock = clock
        self._sync = sync
        self._inflight: deque[Tuple[float, Any]] = deque()

    def __len__(self) -> int:
        return len(self._inflight)

    def submit(self, frame: Any, t_start: Optional[float] = None) -> Optional[float]:
        """t_start: override the latency-clock start for this frame, e.g.
        stamped before input handling so the reported latency is full
        input-to-photon rather than submit-to-ready."""
        self._inflight.append((self._clock() if t_start is None else t_start,
                               frame))
        if len(self._inflight) < self.depth:
            return None
        t_sub, done = self._inflight.popleft()
        self._sync(done)
        return self._clock() - t_sub

    def drain(self) -> Iterator[float]:
        while self._inflight:
            t_sub, done = self._inflight.popleft()
            self._sync(done)
            yield self._clock() - t_sub
