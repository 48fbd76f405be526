"""ASTC/UASTC decoder conformance.

The C++ decoder (native/src/astc.cpp) is validated bit-exactly against the
Mesa llvmpipe GL decoder — the same oracle method used for BPTC. UASTC
payloads (KHR_texture_basisu) are valid ASTC 4x4 blocks, so the same
decoder covers them; a crafted UASTC KTX2 checks the container routing."""

import random
import struct

import numpy as np
import pytest

from superconductor_tpu.native import load_native
from superconductor_tpu.native.astc import decode_astc

ERROR_COLOR = np.array([255, 0, 255, 255], np.uint8)


def _gl():
    try:
        from superconductor_tpu.native.gldecode import decode_astc4x4_gl

        decode_astc4x4_gl(b"\0" * 16, 4, 4)
        return decode_astc4x4_gl
    except Exception:
        pytest.skip("Mesa GL ASTC oracle unavailable")


@pytest.mark.parametrize("srgb", [False, True])
def test_astc_random_blocks_match_oracle(srgb):
    """Random LDR-valid blocks decode bit-exactly vs llvmpipe. (Blocks the
    LDR profile rejects are skipped: the oracle supports the HDR profile,
    where the spec behaviors legitimately diverge.)"""
    if load_native() is None:
        pytest.skip("scnative not built")
    oracle = _gl()
    rng = random.Random(20260816 + srgb)
    tried = 0
    while tried < 400:
        blk = bytes(rng.getrandbits(8) for _ in range(16))
        mine = decode_astc(blk, 4, 4, srgb=srgb)
        if (mine == ERROR_COLOR).all(-1).all():
            continue
        tried += 1
        ref = oracle(blk, 4, 4, srgb=srgb)
        assert np.array_equal(mine, ref), blk.hex()


def test_astc_real_assets_match_oracle():
    import os

    if load_native() is None:
        pytest.skip("scnative not built")
    oracle = _gl()
    from superconductor_tpu.assets.ktx2 import parse_ktx2

    base = "/root/reference/demo/web/assets/lighting/astc"
    if not os.path.isdir(base):
        pytest.skip("reference assets not available")
    for fn in sorted(os.listdir(base))[:3]:
        ktx = parse_ktx2(open(os.path.join(base, fn), "rb").read())
        w, h, _ = ktx.level_dims(0)
        raw = ktx.level_bytes(0)
        size = ((w + 3) // 4) * ((h + 3) // 4) * 16
        payload = raw[:size]
        assert np.array_equal(
            decode_astc(payload, w, h), oracle(payload, w, h)
        ), fn


def make_void_extent_block(color16, hdr=False):
    """LDR void-extent block: bits[0:9)=0x1FC, bit9=hdr, bits 10-11
    reserved ones, 4x13-bit coords all-ones, 4x u16 color at bit 64."""
    b = bytearray(16)
    b[0] = 0xFC
    b[1] = 0xFF if hdr else 0xFD  # bit9 = HDR flag
    for i in range(2, 8):
        b[i] = 0xFF
    struct.pack_into("<4H", b, 8, *color16)
    return bytes(b)


def test_astc_void_extent_and_errors():
    if load_native() is None:
        pytest.skip("scnative not built")
    out = decode_astc(
        make_void_extent_block((0x1234, 0x5678, 0x9ABC, 0xFFFF)), 4, 4
    )
    assert (out == np.array([0x12, 0x56, 0x9A, 0xFF])).all()

    # HDR void extent (bit 9 set): error color in the LDR profile.
    out = decode_astc(
        make_void_extent_block((0x1234, 0x5678, 0x9ABC, 0xFFFF), hdr=True),
        4, 4,
    )
    assert (out == ERROR_COLOR).all()


def make_uastc_ktx2(color=(40, 200, 90, 255), size=8, srgb=False):
    """A UASTC KTX2 (vkFormat UNDEFINED + DFD colorModel 166) whose blocks
    are ASTC void-extents of a constant color."""
    blk = make_void_extent_block([(c << 8) | c for c in color])
    nblk = ((size + 3) // 4) ** 2
    payload = blk * nblk

    magic = b"\xabKTX 20\xbb\r\n\x1a\n"
    header = struct.pack("<9I", 0, 1, size, size, 0, 0, 1, 1, 0)
    dfd_off = 12 + 48 + 20 + 24  # magic+header+index-meta+1 level entry
    dfd = bytearray(28)
    struct.pack_into("<I", dfd, 0, 28)
    dfd[12] = 166  # colorModel = UASTC
    dfd[14] = 2 if srgb else 1  # transferFunction
    data_off = dfd_off + len(dfd)
    index_meta = struct.pack("<4I2Q", dfd_off, len(dfd), 0, 0, 0, 0)
    level = struct.pack("<3Q", data_off, len(payload), len(payload))
    return magic + header + index_meta + level + bytes(dfd) + payload


def test_uastc_ktx2_decodes():
    from superconductor_tpu.assets.ktx2 import decode_level_images, parse_ktx2

    data = make_uastc_ktx2(color=(40, 200, 90, 255), size=8)
    ktx = parse_ktx2(data)
    assert ktx.is_uastc and not ktx.is_etc1s
    img = decode_level_images(ktx, 0)[0]
    assert img.shape == (8, 8, 4)
    expect = np.array([40, 200, 90, 255], np.float32) / 255.0
    assert np.allclose(img, expect, atol=1 / 255)


def test_uastc_srgb_transfer():
    from superconductor_tpu.assets.ktx2 import decode_level_images, parse_ktx2

    data = make_uastc_ktx2(color=(128, 128, 128, 255), size=4, srgb=True)
    ktx = parse_ktx2(data)
    assert ktx.is_srgb_transfer
    img = decode_level_images(ktx, 0)[0]
    # sRGB 128 -> linear ~0.2158
    assert abs(float(img[0, 0, 0]) - 0.2158) < 0.01
    assert abs(float(img[0, 0, 3]) - 1.0) < 1e-6


def test_astc_hdr_matches_uncompressed_twin():
    """The astc-tier lightvol L0 is ASTC HDR (vkFormat 1000066000); its
    uncompressed RGBA16F twin is the ground truth. ~51 dB is the codec's
    own loss; a decoder bug craters this (llvmpipe can't oracle HDR — it
    quantizes ASTC decodes to UNORM8 internally)."""
    import os

    if load_native() is None:
        pytest.skip("scnative not built")
    base = "/root/reference/demo/web/assets/lighting"
    if not os.path.isdir(base):
        pytest.skip("reference assets not available")
    from superconductor_tpu.assets.ktx2 import decode_level_images, parse_ktx2

    astc = parse_ktx2(open(f"{base}/astc/lightvol.ktx2", "rb").read())
    unc = parse_ktx2(open(f"{base}/uncompressed/lightvol.ktx2", "rb").read())
    assert astc.vk_format == 1000066000
    mine = decode_level_images(astc, 0)
    ref = decode_level_images(unc, 0)
    assert len(mine) == len(ref)
    mse = float(np.mean([(m - r) ** 2 for m, r in zip(mine, ref)]))
    peak = max(float(np.abs(r).max()) for r in ref)
    psnr = 10 * np.log10(peak**2 / mse)
    assert psnr > 45.0, psnr


def test_astc_unquant_tables_match_oracle():
    """Color unquantization tables vs values extracted from the oracle
    (full extraction lives in tools/astc_unquant_check.py; spot-check the
    trit/quint modes with the trickiest bit-scatter patterns here)."""
    lib = load_native()
    if lib is None:
        pytest.skip("scnative not built")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    _gl()
    from astc_unquant_check import extract

    for levels in (12, 48, 40, 160, 192):
        table = extract(levels)
        for (d, m), ref in table.items():
            assert lib.sc_astc_unquant_color(levels, d, m) == ref, (levels, d, m)
