"""Corrupt-input fuzzing: loaders and native decoders must degrade with a
Python exception (which the ECS catches and logs, keeping dummies bound —
the reference's never-fatal policy, renderer-core/src/lib.rs:248-267),
NEVER crash the process.

Each case family runs its whole mutation batch in ONE fresh subprocess
(fuzz_worker.py): a segfault in the C++ decoders surfaces as a negative
returncode instead of killing the test run, and the worker prints the blob
index before each case so the failure is attributable. Subprocess (not
os.fork) because forking a multithreaded JAX process trips pytest's
deadlock warnings.

Seeded and bounded (~120 cases total) to stay fast; the same mutations were
run at 5x these counts during development with zero crashes.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from conftest import make_box_glb

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fuzz_worker.py")


def _run_batch(case: str, blobs, timeout_s: float = 300.0):
    """Run all blobs through fuzz_worker.py in one subprocess; fail the test
    on a signal death (negative returncode) or a hang, reporting the index
    of the blob that was being decoded."""
    payload = b"".join(struct.pack("<Q", len(b)) + bytes(b) for b in blobs)
    try:
        proc = subprocess.run(
            [sys.executable, _WORKER, case],
            input=payload,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode(errors="replace").split()
        pytest.fail(f"{case}: worker hang at blob {out[-1] if out else '?'}")
    if proc.returncode != 0:
        out = proc.stdout.decode(errors="replace").split()
        last = out[-1] if out else "?"
        pytest.fail(f"{case}: crash (returncode {proc.returncode}) at blob {last}")


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
    _run_batch("glb", [_mutate(rng, glb, t) for t in range(30)])


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

    # interleave mutation draws exactly as the original per-case harness did
    vblobs, iblobs = [], []
    for trial in range(24):
        vblobs.append(_mutate(rng, vstream, trial))
        iblobs.append(_mutate(rng, istream, trial))
    _run_batch("meshopt-vertex", vblobs)
    _run_batch("meshopt-index", iblobs)


def test_fuzz_ktx2_and_block_decoders_never_crash():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_texture_lifecycle import _chain, make_rgba8_ktx2

    rng = np.random.default_rng(2)
    ktx = make_rgba8_ktx2(_chain((10, 20, 30, 255), size=16))
    _run_batch("ktx2", [_mutate(rng, ktx, t) for t in range(18)])

    blobs = [
        bytes(rng.integers(0, 255, size=16 * 16, dtype=np.uint8))
        for _ in range(6)
    ]
    for case in ("bc7", "bc6h", "astc"):
        _run_batch(case, blobs)
