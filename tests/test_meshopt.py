"""meshopt codec round-trips: Python encoder -> Python + C++ decoders."""

import numpy as np
import pytest

from superconductor_tpu.assets.meshopt import (
    decode_index_buffer,
    decode_vertex_buffer,
    encode_index_buffer,
    encode_vertex_buffer,
)


@pytest.mark.parametrize("count,stride", [(7, 12), (16, 12), (300, 16), (1000, 8)])
def test_vertex_roundtrip_python(count, stride):
    rng = np.random.default_rng(count * stride)
    # mix of smooth data (small deltas) and noise
    smooth = np.cumsum(rng.integers(-3, 4, (count, stride)), axis=0) % 256
    data = encode_vertex_buffer(smooth.astype(np.uint8))
    out = decode_vertex_buffer(data, count, stride)
    np.testing.assert_array_equal(out, smooth.astype(np.uint8))


def test_vertex_roundtrip_native():
    from superconductor_tpu.native import load_native

    lib = load_native()
    if lib is None:
        pytest.skip("scnative not built")
    import ctypes

    rng = np.random.default_rng(5)
    verts = rng.integers(0, 256, (500, 12), dtype=np.uint8)
    data = encode_vertex_buffer(verts)
    out = np.zeros_like(verts)
    rc = lib.sc_meshopt_decode_vertex(
        data, len(data), 500, 12, out.ctypes.data_as(ctypes.c_void_p)
    )
    assert rc == 0
    np.testing.assert_array_equal(out, verts)


def test_index_roundtrip_python():
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 5000, 3 * 257, dtype=np.uint32)
    data = encode_index_buffer(idx)
    out = decode_index_buffer(data, len(idx))
    np.testing.assert_array_equal(out, idx)


def test_index_roundtrip_native():
    from superconductor_tpu.native import load_native

    lib = load_native()
    if lib is None:
        pytest.skip("scnative not built")
    import ctypes

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 100000, 3 * 400, dtype=np.uint32)
    data = encode_index_buffer(idx)
    out = np.zeros(len(idx), np.uint32)
    rc = lib.sc_meshopt_decode_index(
        data, len(data), len(idx), out.ctypes.data_as(ctypes.c_void_p)
    )
    assert rc == 0
    np.testing.assert_array_equal(out, idx)


def test_gltf_meshopt_bufferview():
    """EXT_meshopt_compression bufferView through the glTF parser."""
    from superconductor_tpu.assets.gltf import parse_gltf
    import json

    pos = (np.arange(48, dtype=np.float32) / 7.0).reshape(16, 3)
    raw = pos.astype("<f4").tobytes()
    comp = encode_vertex_buffer(np.frombuffer(raw, np.uint8).reshape(16, 12))
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(comp)}],
        "bufferViews": [
            {
                "buffer": 0,
                "byteLength": 16 * 12,
                "extensions": {
                    "EXT_meshopt_compression": {
                        "buffer": 0,
                        "byteOffset": 0,
                        "byteLength": len(comp),
                        "count": 16,
                        "byteStride": 12,
                        "mode": "ATTRIBUTES",
                    }
                },
            }
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 16, "type": "VEC3"}
        ],
        "extensionsUsed": ["EXT_meshopt_compression"],
    }
    import struct

    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    blob = comp + b"\0" * ((-len(comp)) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(blob))
    glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    glb += struct.pack("<II", len(blob), 0x004E4942) + blob

    g = parse_gltf(glb)
    decoded = g.accessor(0)
    np.testing.assert_allclose(decoded, pos, rtol=1e-6)


# ---------------------------------------------------------------------------
# Index SEQUENCE codec (mode 2)
# ---------------------------------------------------------------------------


def test_index_sequence_roundtrip_python():
    from superconductor_tpu.assets.meshopt import (
        decode_index_sequence,
        encode_index_sequence,
    )

    rng = np.random.default_rng(4)
    for n in (1, 7, 100, 1000):
        idx = rng.integers(0, 5000, n).astype(np.uint32)
        enc = encode_index_sequence(idx)
        np.testing.assert_array_equal(decode_index_sequence(enc, n), idx)
    # line-strip-like monotone sequence (the codec's target workload)
    idx = np.arange(500, dtype=np.uint32)
    enc = encode_index_sequence(idx)
    np.testing.assert_array_equal(decode_index_sequence(enc, 500), idx)


def test_index_sequence_native_matches_python():
    from superconductor_tpu.assets.meshopt import (
        _native,
        _native_index_sequence,
        encode_index_sequence,
    )

    lib = _native()
    if lib is None or not hasattr(lib, "sc_meshopt_decode_index_sequence"):
        import pytest

        pytest.skip("scnative not built")
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 100000, 777).astype(np.uint32)
    enc = encode_index_sequence(idx)
    np.testing.assert_array_equal(_native_index_sequence(lib, enc, 777), idx)


def test_index_sequence_wire_format_hand_vector():
    """Hand-assembled byte stream pinning the wire format (not produced by
    the repo's own encoder): per index one vbyte, bit0 = baseline select,
    rest = zigzag delta applied to that baseline."""
    from superconductor_tpu.assets.meshopt import decode_buffer_view

    stream = bytes([
        0xD1,        # header: sequence codec, version 1
        0x00,        # baseline0 += 0          -> 0
        0x15,        # baseline1 += +5 (zz 10) -> 5
        0x0C,        # baseline0 += +3 (zz 6)  -> 3
        0x03,        # baseline1 += -1 (zz 1)  -> 4
        0x94, 0x06,  # baseline0 += +197 (zz 394, vbyte 0x94 0x06) -> 200
        0, 0, 0, 0,  # tail padding
    ])
    out = decode_buffer_view(stream, mode=2, count=5, stride=4)
    np.testing.assert_array_equal(
        out.view(np.uint32), np.array([0, 5, 3, 4, 200], np.uint32)
    )
    out16 = decode_buffer_view(stream, mode="INDICES", count=5, stride=2)
    np.testing.assert_array_equal(
        out16.view(np.uint16), np.array([0, 5, 3, 4, 200], np.uint16)
    )


def test_index_triangles_wire_format_hand_vector():
    """Hand-assembled TRIANGLES stream (not from the repo's encoder):
    tri 0 via the 0xFE explicit-codeaux escape (all-new vertices 0,1,2),
    tri 1 via code 0x00 = reuse newest edge (a,c)=(0,2) + new vertex 3."""
    from superconductor_tpu.assets.meshopt import decode_index_buffer

    stream = bytes([0xE1, 0xFE, 0x00]) + bytes([0x00]) + bytes(16)
    out = decode_index_buffer(stream, 6)
    np.testing.assert_array_equal(
        out, np.array([0, 1, 2, 0, 2, 3], np.uint32)
    )
