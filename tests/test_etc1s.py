"""ETC1S / BasisLZ transcoder conformance.

The reference consumes KHR_texture_basisu ETC1S files through the
basis-universal transcoder (renderer-core/Cargo.toml:29,
textures.rs:929-1097). Validation here is layered, because no ETC1S
assets or reference encoder exist in this environment:

  1. Block layer (palette -> texels): bit-exact against Mesa llvmpipe's
     independent ETC2 decoder — every ETC1S block is a valid ETC1/ETC2
     block (pack_etc1_blocks re-serializes our palette entries to raw
     ETC1 blocks for the oracle).
  2. Bitstream layer: hand-assembled wire vectors (canonical Huffman,
     VLC, delta coding) pin the decoder independently of the in-repo
     encoder; encoder round-trips then cover every stream variant
     (raw/XOR-delta selector palettes, selector history + RLE, alpha
     slices, mip chains).
  3. Container layer: a full BasisLZ KTX2 file decodes through the
     public ktx2.decode_level_u8 / decode_level_images entry points.
"""

import numpy as np
import pytest

from superconductor_tpu.assets import basislz, ktx2
from superconductor_tpu.native import load_native

pytestmark = pytest.mark.skipif(
    load_native() is None or not hasattr(load_native(), "sc_etc1s_transcode_slice"),
    reason="scnative with ETC1S support not built",
)


def _etc2_oracle():
    try:
        from superconductor_tpu.native.gldecode import decode_etc2_gl

        decode_etc2_gl(b"\0" * 8, 4, 4)
        return decode_etc2_gl
    except Exception:
        pytest.skip("Mesa GL ETC2 oracle unavailable")


def _smooth_test_image(h=37, w=53):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            x * 255 / (w - 1),
            y * 255 / (h - 1),
            (x + y) * 255 / (w + h - 2),
            np.full((h, w), 200.0),
        ],
        -1,
    ).astype(np.uint8)
    img[8:16, 8:24] = (30, 200, 90, 128)
    return img


# ------------------------------------------------------- 1. block layer


def test_block_expansion_matches_mesa_etc2():
    """expand_blocks (vectorized palette -> texels) is bit-exact against
    llvmpipe's ETC2 decoder on random palette entries."""
    oracle = _etc2_oracle()
    rng = np.random.default_rng(20260816)
    n, nbx, nby = 128, 16, 8
    endpoints = np.stack(
        [
            rng.integers(0, 32, n),
            rng.integers(0, 32, n),
            rng.integers(0, 32, n),
            rng.integers(0, 8, n),
        ],
        -1,
    ).astype(np.uint8)
    selectors = rng.integers(0, 4, (n, 16)).astype(np.uint8)
    ep_idx = np.arange(n, dtype=np.uint32).reshape(nby, nbx)
    ours = basislz.expand_blocks(endpoints, selectors, ep_idx, ep_idx)
    blocks = basislz.pack_etc1_blocks(endpoints, selectors, ep_idx, ep_idx)
    theirs = oracle(blocks, nbx * 4, nby * 4)
    assert (ours == theirs).all()


def test_intensity_clamp_matches_mesa():
    """Saturating arithmetic at both ends (table 7 = ±183) matches GL."""
    oracle = _etc2_oracle()
    endpoints = np.array([[1, 30, 15, 7], [0, 31, 16, 6]], np.uint8)
    selectors = np.array([[0, 1, 2, 3] * 4, [3, 2, 1, 0] * 4], np.uint8)
    idx = np.array([[0, 1]], np.uint32)
    ours = basislz.expand_blocks(endpoints, selectors, idx, idx)
    blocks = basislz.pack_etc1_blocks(endpoints, selectors, idx, idx)
    assert (ours == oracle(blocks, 8, 4)).all()


# ---------------------------------------------------- 2. bitstream layer


def _bw_table_single_symbol(bw, num_syms, sym):
    """Hand-emit a Huffman table whose only used symbol is `sym` (length-1
    code '0'), mirroring read_huffman_table's wire layout."""
    bw.put_bits(sym + 1, 14)  # total_used_syms
    bw.put_bits(21, 5)  # num codelength codes
    # code-length code: symbol 1 gets length 1, symbol 0 gets length 1
    lens = {0: 1, 1: 1}
    for cl_sym in basislz._SORTED_CODELENGTH_CODES:
        bw.put_bits(lens.get(cl_sym, 0), 3)
    # cl canonical codes: sym 0 -> '0', sym 1 -> '1'
    for i in range(sym):
        bw.put_bits(0, 1)  # length 0 (unused symbol)
    bw.put_bits(1, 1)  # `sym` has code length 1


def test_hand_assembled_endpoint_palette():
    """A hand-built endpoint stream (no encoder involved) decodes to the
    expected palette: checks table serialization, the 3-model color5 delta
    ranges and the inten delta wrap."""
    bw = basislz.BitWriter()
    # Model 0 (prev<=9): never used here but must parse -> single symbol 0.
    _bw_table_single_symbol(bw, 41, 0)
    # Model 1 (10<=prev<=21): used for the first component steps from 16.
    # Single used symbol 23 -> delta 23-21 = +2.
    _bw_table_single_symbol(bw, 43, 23)
    # Model 2 (prev>=22): single symbol 29 -> delta 29-31 = -2.
    _bw_table_single_symbol(bw, 41, 29)
    # Inten model: single symbol 5 -> inten += 5 (mod 8).
    _bw_table_single_symbol(bw, 8, 5)
    bw.put_bits(0, 1)  # not grayscale
    # Endpoint 0: inten=5, rgb 16+2 -> 18 each (model 1 at prev=16).
    # All three writes are the single '0' code of their model's table.
    for _ in range(1 + 3):
        bw.put_bits(0, 1)
    # Endpoint 1: inten=(5+5)&7=2; prev=18 -> model 1 again -> 20.
    for _ in range(1 + 3):
        bw.put_bits(0, 1)
    # Endpoint 2: inten=7; prev=20 -> model 1 -> 22.
    for _ in range(1 + 3):
        bw.put_bits(0, 1)
    # Endpoint 3: inten=4; prev=22 -> model 2 -> delta -2 -> 20.
    for _ in range(1 + 3):
        bw.put_bits(0, 1)
    ep_stream = bw.getvalue()

    # Raw selector stream with one entry: rows 0b11100100 = sel 0,1,2,3.
    sb = basislz.BitWriter()
    sb.put_bits(0, 1)
    sb.put_bits(0, 1)
    sb.put_bits(1, 1)  # raw
    for _ in range(4):
        sb.put_bits(0b11100100, 8)
    sel_stream = sb.getvalue()

    import ctypes

    lib = load_native()
    endpoints = np.zeros((4, 4), np.uint8)
    selectors = np.zeros((1, 16), np.uint8)
    rc = lib.sc_etc1s_decode_palettes(
        ep_stream,
        ctypes.c_uint32(len(ep_stream)),
        ctypes.c_uint32(4),
        sel_stream,
        ctypes.c_uint32(len(sel_stream)),
        ctypes.c_uint32(1),
        endpoints.ctypes.data_as(ctypes.c_void_p),
        selectors.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0
    assert endpoints.tolist() == [
        [18, 18, 18, 5],
        [20, 20, 20, 2],
        [22, 22, 22, 7],
        [20, 20, 20, 4],
    ]
    assert selectors[0].tolist() == [0, 1, 2, 3] * 4


def test_hand_assembled_slice_stream():
    """A hand-built 2x2-block slice: one endpoint-pred symbol covering the
    quad (left / upper / upper-left / explicit), explicit endpoint deltas
    with modular wrap, and direct selector symbols."""
    # Tables blob: pred model uses symbol 0b01_10_00_11 = explicit(3) at
    # (0,0), left(0) at (0,1) -> pred bits order is (dy*2+dx)*2.
    pred_sym = 3 | (0 << 2) | (1 << 4) | (2 << 6)  # explicit, left, up, up-left
    tb = basislz.BitWriter()
    _bw_table_single_symbol(tb, 257, pred_sym)
    _bw_table_single_symbol(tb, 3, 2)  # delta model: always +2 (mod 3)
    _bw_table_single_symbol(tb, 3, 1)  # selector model: always index 1
    _bw_table_single_symbol(tb, 64, 0)  # rle model (unused)
    tb.put_bits(0, 13)  # history_size = 0
    tables = tb.getvalue()

    sl = basislz.BitWriter()
    sl.put_bits(0, 1)  # pred symbol ('0' code)
    sl.put_bits(0, 1)  # explicit delta for (0,0): (0+2) mod 3 = 2
    sl.put_bits(0, 1)  # selector (0,0) -> 1
    sl.put_bits(0, 1)  # selector (0,1) -> 1 (endpoint pred: left)
    sl.put_bits(0, 1)  # selector (1,0) -> 1 (pred: upper)
    sl.put_bits(0, 1)  # selector (1,1) -> 1 (pred: upper-left)
    slice_bytes = sl.getvalue()

    gd = basislz.BasisLzData(
        endpoints=np.zeros((3, 4), np.uint8),
        selectors=np.zeros((2, 16), np.uint8),
        tables=tables,
        image_descs=[],
    )
    ep_idx, sel_idx = basislz.transcode_slice(gd, slice_bytes, 2, 2)
    assert ep_idx.tolist() == [[2, 2], [2, 2]]
    assert sel_idx.tolist() == [[1, 1], [1, 1]]


def test_selector_history_and_rle_roundtrip():
    """History-buffer hits (approximate MTF) and RLE runs survive an
    encoder round-trip on a selector-repetitive image."""
    rng = np.random.default_rng(3)
    img = np.repeat(
        np.repeat(rng.integers(0, 256, (4, 4, 4), np.uint8), 16, 0), 16, 1
    )  # 64x64, large flat patches -> long selector runs
    blob = basislz.write_etc1s_ktx2(img, history_size=64, use_rle=True)
    k = ktx2.parse_ktx2(blob)
    out = ktx2.decode_level_u8(k, 0)
    err = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int)).mean()
    assert err < 12


# ---------------------------------------------------- 3. container layer


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(with_alpha=True),
        dict(num_levels=3),
        dict(raw_selectors=False),
        dict(
            with_alpha=True,
            num_levels=2,
            history_size=16,
            use_rle=True,
            raw_selectors=False,
        ),
    ],
)
def test_ktx2_container_roundtrip(kwargs):
    img = _smooth_test_image()
    blob = basislz.write_etc1s_ktx2(img, **kwargs)
    k = ktx2.parse_ktx2(blob)
    assert k.is_etc1s and not k.is_uastc
    assert k.is_srgb_transfer
    out = ktx2.decode_level_u8(k, 0)
    assert out.shape == img.shape
    err = np.abs(out[..., :3].astype(int) - img[..., :3].astype(int)).mean()
    assert err < 12
    if kwargs.get("with_alpha"):
        aerr = np.abs(out[..., 3].astype(int) - img[..., 3].astype(int)).mean()
        assert aerr < 12
    else:
        assert (out[..., 3] == 255).all()
    for lvl in range(1, kwargs.get("num_levels", 1)):
        w, h, _ = k.level_dims(lvl)
        assert ktx2.decode_level_u8(k, lvl).shape == (h, w, 4)


def test_decode_level_images_linearizes_srgb():
    img = _smooth_test_image()
    k = ktx2.parse_ktx2(basislz.write_etc1s_ktx2(img, srgb=True))
    (linear,) = ktx2.decode_level_images(k, 0)
    (display,) = ktx2.decode_level_images(k, 0, linearize=False)
    assert linear.dtype == np.float32
    # sRGB decode darkens midtones.
    mid = (display[..., :3] > 0.15) & (display[..., :3] < 0.85)
    assert (linear[..., :3][mid] < display[..., :3][mid]).all()


def test_block_layer_of_full_image_matches_mesa():
    """End-to-end cross-check: decode a KTX2 image both through our
    vectorized expansion and through Mesa (via re-packed raw ETC1 blocks
    of the same transcoded indices)."""
    oracle = _etc2_oracle()
    img = _smooth_test_image(40, 56)  # block-aligned for the oracle
    blob = basislz.write_etc1s_ktx2(img)
    k = ktx2.parse_ktx2(blob)
    gd = basislz._cached_global_data(k)
    _f, off, ln, _ao, _al = gd.image_descs[0]
    data = k.level_bytes(0)
    ep_idx, sel_idx = basislz.transcode_slice(gd, data[off : off + ln], 14, 10)
    ours = basislz.expand_blocks(gd.endpoints, gd.selectors, ep_idx, sel_idx)
    blocks = basislz.pack_etc1_blocks(gd.endpoints, gd.selectors, ep_idx, sel_idx)
    assert (ours == oracle(blocks, 56, 40)).all()


# ------------------------------------------------- 4. streamer integration


def test_etc1s_streams_into_scene():
    """An ETC1S KTX2 streams through the async TextureStreamer: the preview
    phase must fetch the BasisLZ global data (codebooks) by byte range —
    the SGD here is deliberately larger than the 4 KB header read."""
    import struct
    import time

    from superconductor_tpu.assets.fetch import MemoryClient
    from superconductor_tpu.assets.texture_stream import TextureStreamer
    from superconductor_tpu.scene.scene import (
        MaterialSettings,
        Scene,
        TEX_DUMMY_WHITE,
    )

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (64, 64, 4), np.uint8)
    img = np.repeat(np.repeat(noise, 4, 0), 4, 1)  # distinct block per 4x4
    blob = basislz.write_etc1s_ktx2(img, num_levels=2)
    sgd_off, sgd_len = struct.unpack_from("<2Q", blob, 64)
    assert sgd_off + sgd_len > 4096  # forces the range-fetch splice

    scene = Scene()
    streamer = TextureStreamer(MemoryClient({"tex.ktx2": blob}))
    mat = scene.add_material(MaterialSettings())
    streamer.request(mat, "albedo_tex", "tex.ktx2", srgb=True)
    deadline = time.time() + 10
    while time.time() < deadline:
        streamer.pump(scene)
        if scene.materials[mat].albedo_tex != TEX_DUMMY_WHITE and streamer.idle:
            break
        time.sleep(0.01)
    tex_id = scene.materials[mat].albedo_tex
    assert tex_id != TEX_DUMMY_WHITE
    assert scene.textures.tex_mip_count[tex_id] == 2
    base = scene.textures.tex_mip_base[tex_id]
    off = scene.textures.mip_offset[base]
    got = np.asarray(scene.textures.texels.host[off : off + 256 * 256]).reshape(
        256, 256, -1
    )
    err = np.abs(got[..., :3].astype(int) - img[..., :3].astype(int)).mean()
    assert err < 70  # pure-noise content; just proves real texels landed
