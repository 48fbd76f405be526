"""Corrupt-input fuzzing: loaders and native decoders must degrade with a
Python exception (which the ECS catches and logs, keeping dummies bound —
the reference's never-fatal policy, renderer-core/src/lib.rs:248-267),
NEVER crash the process. Each case runs in a fork so a segfault in the C++
decoders is detected as a signal instead of killing the test run.

Seeded and bounded (~120 forks total) to stay fast; the same harness was
run at 5x these counts during development with zero crashes.
"""

import os
import struct
import sys

import numpy as np
import pytest

from conftest import make_box_glb

if not hasattr(os, "fork"):  # pragma: no cover
    pytest.skip("fork-based harness", allow_module_level=True)


def _forked(fn, timeout_s: float = 20.0) -> int:
    """Run fn in a child; return the wait status. A child that exceeds the
    deadline (decoder infinite loop on corrupt input) is killed and
    reported as a signal — a hang is a defect, not a degrade."""
    import signal
    import time

    pid = os.fork()
    if pid == 0:
        os.close(1)
        os.close(2)
        try:
            fn()
            os._exit(0)
        except BaseException:
            os._exit(1)  # clean Python failure = acceptable degrade
    deadline = time.time() + timeout_s
    while True:
        done, status = os.waitpid(pid, os.WNOHANG)
        if done:
            return status
        if time.time() > deadline:
            os.kill(pid, signal.SIGKILL)
            _, status = os.waitpid(pid, 0)
            return status
        time.sleep(0.005)


def _assert_no_signal(status, ctx):
    assert not os.WIFSIGNALED(status), (ctx, os.WTERMSIG(status))


def _mutate(rng, base: bytes, trial: int) -> bytearray:
    d = bytearray(base)
    mode = trial % 3
    if mode == 0:  # bit flips
        for _ in range(int(rng.integers(1, 10))):
            d[int(rng.integers(0, len(d)))] ^= int(rng.integers(1, 255))
    elif mode == 1:  # truncation
        d = d[: int(rng.integers(1, len(d)))]
    else:  # corrupt a header/length field
        off = int(rng.integers(0, min(70, len(d) - 4)))
        struct.pack_into("<I", d, off, int(rng.integers(0, 1 << 31)))
    return d


def test_fuzz_glb_loader_never_crashes():
    rng = np.random.default_rng(0)
    glb = make_box_glb()

    def case(data):
        import superconductor_tpu as sc
        from superconductor_tpu.assets.models import load_model

        try:
            load_model(sc.Scene(), bytes(data), name="f")
        except Exception:
            pass

    for trial in range(30):
        d = _mutate(rng, glb, trial)
        _assert_no_signal(_forked(lambda dd=d: case(dd)), ("glb", trial))


def test_fuzz_meshopt_decoders_never_crash():
    import superconductor_tpu.assets.meshopt as M

    rng = np.random.default_rng(1)
    verts = (
        (rng.normal(size=(64, 16)) * 100)
        .astype(np.float32)
        .view(np.uint8)
        .reshape(64, 64)
    )
    vstream = M.encode_vertex_buffer(verts)
    idx = rng.integers(0, 63, size=120, dtype=np.uint32)
    istream = M.encode_index_buffer(idx)

    def vcase(d):
        try:
            M.decode_vertex_buffer(bytes(d), 64, 64)
        except Exception:
            pass

    def icase(d):
        try:
            M.decode_index_buffer(bytes(d), 120)
        except Exception:
            pass

    for trial in range(24):
        _assert_no_signal(
            _forked(lambda dd=_mutate(rng, vstream, trial): vcase(dd)),
            ("meshopt-vertex", trial),
        )
        _assert_no_signal(
            _forked(lambda dd=_mutate(rng, istream, trial): icase(dd)),
            ("meshopt-index", trial),
        )


def test_fuzz_ktx2_and_block_decoders_never_crash():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_texture_lifecycle import _chain, make_rgba8_ktx2

    rng = np.random.default_rng(2)
    ktx = make_rgba8_ktx2(_chain((10, 20, 30, 255), size=16))

    def kcase(d):
        from superconductor_tpu.assets.ktx2 import decode_level_u8, parse_ktx2

        try:
            decode_level_u8(parse_ktx2(bytes(d)), 0)
        except Exception:
            pass

    for trial in range(18):
        _assert_no_signal(
            _forked(lambda dd=_mutate(rng, ktx, trial): kcase(dd)),
            ("ktx2", trial),
        )

    def bcase(blob, which):
        from superconductor_tpu.native.astc import decode_astc
        from superconductor_tpu.native.bc6h import decode_bc6h
        from superconductor_tpu.native.bc7 import decode_bc7

        try:
            [decode_bc7, decode_bc6h, decode_astc][which](blob, 16, 16)
        except Exception:
            pass

    for trial in range(6):
        blob = bytes(rng.integers(0, 255, size=16 * 16, dtype=np.uint8))
        for which in range(3):
            _assert_no_signal(
                _forked(lambda b=blob, w=which: bcase(b, w)),
                ("block", trial, which),
            )
