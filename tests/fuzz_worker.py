"""Subprocess worker for tests/test_fuzz.py.

Reads length-prefixed blobs from stdin and runs the named decoder case over
each, printing the blob index (flushed) before each run so a crash or hang
is attributable from the captured stdout. Exit 0 = every blob either
decoded or raised a clean Python exception (the acceptable degrade; the
ECS catches and logs these, keeping dummies bound — the reference's
never-fatal policy, renderer-core/src/lib.rs:248-267).
"""

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_blobs(stream):
    data = stream.read()
    blobs = []
    off = 0
    while off < len(data):
        (n,) = struct.unpack_from("<Q", data, off)
        off += 8
        blobs.append(data[off : off + n])
        off += n
    return blobs


def main():
    case = sys.argv[1]
    # Force the CPU backend before anything imports jax: the fuzz targets
    # are host-side decoders and TPU init is slow (env var alone is not
    # enough — the axon plugin overrides it).
    import jax

    jax.config.update("jax_platforms", "cpu")

    blobs = _read_blobs(sys.stdin.buffer)

    if case == "glb":
        import superconductor_tpu as sc
        from superconductor_tpu.assets.models import load_model

        def run(d):
            load_model(sc.Scene(), bytes(d), name="f")

    elif case == "meshopt-vertex":
        import superconductor_tpu.assets.meshopt as M

        def run(d):
            M.decode_vertex_buffer(bytes(d), 64, 64)

    elif case == "meshopt-index":
        import superconductor_tpu.assets.meshopt as M

        def run(d):
            M.decode_index_buffer(bytes(d), 120)

    elif case == "ktx2":
        from superconductor_tpu.assets.ktx2 import decode_level_u8, parse_ktx2

        def run(d):
            decode_level_u8(parse_ktx2(bytes(d)), 0)

    elif case in ("bc7", "bc6h", "astc"):
        from superconductor_tpu.native.astc import decode_astc
        from superconductor_tpu.native.bc6h import decode_bc6h
        from superconductor_tpu.native.bc7 import decode_bc7

        dec = {"bc7": decode_bc7, "bc6h": decode_bc6h, "astc": decode_astc}[case]

        def run(d):
            dec(bytes(d), 16, 16)

    else:
        raise SystemExit(f"unknown case {case!r}")

    for i, d in enumerate(blobs):
        print(i, flush=True)
        try:
            run(d)
        except Exception:
            pass  # clean Python failure = acceptable degrade
    return 0


if __name__ == "__main__":
    sys.exit(main())
