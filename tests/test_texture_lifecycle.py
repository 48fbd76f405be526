"""Texture pool lifecycle: progressive streaming without stranded texels,
dirty-range device uploads, late-requester service, pool range reuse."""

import struct
import time

import numpy as np

from superconductor_tpu.assets.fetch import MemoryClient
from superconductor_tpu.assets.texture_stream import TextureStreamer
from superconductor_tpu.scene.buffers import GrowableArray
from superconductor_tpu.scene.scene import (
    MaterialSettings,
    Scene,
    TEX_DUMMY_WHITE,
)


def make_rgba8_ktx2(levels):
    """Author a minimal uncompressed RGBA8 KTX2 from a mip chain
    (finest first, each (h, w, 4) uint8)."""
    magic = b"\xabKTX 20\xbb\r\n\x1a\n"
    n = len(levels)
    h0, w0 = levels[0].shape[:2]
    header = struct.pack(
        "<9I", 37, 1, w0, h0, 0, 0, 1, n, 0
    )  # vkFormat=RGBA8_UNORM, typeSize, w, h, depth, layers, faces, levels, scheme
    dfd_kvd_sgd = struct.pack("<4I2Q", 0, 0, 0, 0, 0, 0)
    index_off = 12 + 48 + 20 + n * 24
    # level payloads laid out smallest-last-first per convention
    offsets = []
    payloads = b""
    data_off = index_off
    for lvl in reversed(levels):
        b = lvl.tobytes()
        offsets.append((data_off + len(payloads), len(b), len(b)))
        payloads += b
    offsets = offsets[::-1]  # back to finest-first to match the level index
    index = b"".join(struct.pack("<3Q", *o) for o in offsets)
    out = magic + header + dfd_kvd_sgd + index + payloads
    assert len(out[: 12 + 48 + 20]) == index_off - n * 24
    return out


def _chain(color, size=8):
    levels = []
    s = size
    while True:
        levels.append(np.full((s, s, 4), color, np.uint8))
        if s == 1:
            break
        s //= 2
    return levels


def _pump_until(streamer, scene, pred, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        streamer.pump(scene)
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_progressive_stream_no_stranded_texels():
    """Preview + final must land in ONE allocation: pool texel use after the
    stream equals exactly the final chain's size."""
    chain = _chain((10, 200, 30, 255), size=8)
    ktx = make_rgba8_ktx2(chain)
    client = MemoryClient({"tex.ktx2": ktx})
    scene = Scene()
    streamer = TextureStreamer(client)
    mat = scene.add_material(MaterialSettings())
    used_before = scene.textures.texels.alloc.used()

    streamer.request(mat, "albedo_tex", "tex.ktx2", srgb=True)
    assert _pump_until(
        streamer, scene,
        lambda: scene.materials[mat].albedo_tex != TEX_DUMMY_WHITE
        and streamer.idle,
    )
    tex_id = scene.materials[mat].albedo_tex
    # full mip view restored after the final phase
    assert scene.textures.tex_mip_count[tex_id] == len(chain)
    # finest level content correct
    base = scene.textures.tex_mip_base[tex_id]
    off = scene.textures.mip_offset[base]
    assert scene.textures.texels.host[off][1] == 200

    chain_texels = sum(l.shape[0] * l.shape[1] for l in chain)
    used_after = scene.textures.texels.alloc.used()
    assert used_after - used_before == chain_texels, (used_before, used_after)


def test_preview_phase_restricts_mip_view():
    """While only the smallest mip is loaded, the sampler view must expose
    just that level (never garbage from unwritten finer mips)."""
    chain = _chain((90, 40, 250, 255), size=16)
    ktx = make_rgba8_ktx2(chain)

    class SlowClient(MemoryClient):
        def fetch_bytes(self, url):  # delays the full-chain phase
            time.sleep(0.4)
            return super().fetch_bytes(url)

    scene = Scene()
    streamer = TextureStreamer(SlowClient({"tex.ktx2": ktx}))
    mat = scene.add_material(MaterialSettings())
    streamer.request(mat, "albedo_tex", "tex.ktx2", srgb=False)
    assert _pump_until(
        streamer, scene,
        lambda: scene.materials[mat].albedo_tex != TEX_DUMMY_WHITE,
    )
    tex_id = scene.materials[mat].albedo_tex
    if scene.textures.tex_mip_count[tex_id] == 1:  # still in preview
        base = scene.textures.tex_mip_base[tex_id]
        assert scene.textures.mip_w[base] == 1  # the 1x1 smallest mip
        off = scene.textures.mip_offset[base]
        assert scene.textures.texels.host[off][2] == 250
    # and the final restores the full chain
    assert _pump_until(
        streamer, scene,
        lambda: scene.textures.tex_mip_count[tex_id] == len(chain),
    )


def test_late_requester_served_from_loaded_texture():
    chain = _chain((255, 128, 0, 255), size=4)
    client = MemoryClient({"tex.ktx2": make_rgba8_ktx2(chain)})
    scene = Scene()
    streamer = TextureStreamer(client)
    mat_a = scene.add_material(MaterialSettings())
    streamer.request(mat_a, "albedo_tex", "tex.ktx2", srgb=True)
    assert _pump_until(
        streamer, scene,
        lambda: scene.materials[mat_a].albedo_tex != TEX_DUMMY_WHITE
        and streamer.idle,
    )
    # A material requesting the same URL after completion must be served
    # (round-1 bug: it kept the dummy forever).
    mat_b = scene.add_material(MaterialSettings())
    streamer.request(mat_b, "emissive_tex", "tex.ktx2", srgb=True)
    streamer.pump(scene)
    assert scene.materials[mat_b].emissive_tex == scene.materials[mat_a].albedo_tex


def test_free_texture_returns_ranges():
    scene = Scene()
    used0 = scene.textures.texels.alloc.used()
    tex = scene.textures.add_texture(_chain((1, 2, 3, 4), size=8))
    grew = scene.textures.texels.alloc.used() - used0
    assert grew > 0
    scene.textures.free_texture(tex)
    assert scene.textures.texels.alloc.used() == used0


def test_growable_dirty_range_upload_correct():
    g = GrowableArray((4,), np.uint8, initial_capacity=64)
    g.push(np.arange(64 * 4, dtype=np.uint8).reshape(64, 4) % 251)
    d0 = np.asarray(g.device())
    assert np.array_equal(d0, g.host)
    # small in-place write -> ranged update path (no full re-upload)
    g.write(10, np.full((3, 4), 77, np.uint8))
    d1 = np.asarray(g.device())
    assert np.array_equal(d1, g.host)
    assert d1[10, 0] == 77 and d1[13, 0] == d0[13, 0]
    # growth -> full re-upload path
    g.push(np.zeros((100, 4), np.uint8))
    d2 = np.asarray(g.device())
    assert np.array_equal(d2, g.host)


def test_final_fetch_failure_keeps_preview_and_serves_late_requesters():
    """Phase-2 (full chain) failure after the preview was queued must bind
    waiters to the low-res preview — not leave them on the dummy with the
    preview texels orphaned — and later requesters must alias to it."""
    chain = _chain((10, 220, 30, 255), size=8)
    ktx = make_rgba8_ktx2(chain)

    class FailingFinalClient(MemoryClient):
        def fetch_bytes_range(self, url, start, end):  # phase 1 path
            return self.files[url][start:end]

        def fetch_bytes(self, url):  # phase 2 only
            raise IOError("final fetch failed")

    scene = Scene()
    streamer = TextureStreamer(FailingFinalClient({"tex.ktx2": ktx}))
    mat = scene.add_material(MaterialSettings())
    streamer.request(mat, "albedo_tex", "tex.ktx2", srgb=False)
    assert _pump_until(
        streamer, scene,
        lambda: scene.materials[mat].albedo_tex != TEX_DUMMY_WHITE
        and streamer.idle,
    )
    tex_id = scene.materials[mat].albedo_tex
    # preview (1x1 smallest mip) is what's bound
    assert scene.textures.tex_mip_count[tex_id] == 1
    base = scene.textures.tex_mip_base[tex_id]
    off = scene.textures.mip_offset[base]
    assert tuple(scene.textures.texels.host[off]) == (10, 220, 30, 255)
    # a later requester for the same key gets the preview too
    mat_b = scene.add_material(MaterialSettings())
    streamer.request(mat_b, "emissive_tex", "tex.ktx2", srgb=False)
    streamer.pump(scene)
    assert scene.materials[mat_b].emissive_tex == tex_id


def test_free_texture_descriptor_stays_safe():
    """A freed texture's descriptor must sample pool texel 0, not a
    neighboring texture's descriptor rows (level clamp with count=0 indexed
    base-1 before the fix), and double-free must be a no-op."""
    scene = Scene()
    a = scene.textures.add_texture(_chain((9, 9, 9, 9), size=4))
    b = scene.textures.add_texture(_chain((7, 7, 7, 7), size=4))
    used_after_a = None
    scene.textures.free_texture(b)
    assert scene.textures.tex_mip_count[b] == 1
    base = scene.textures.tex_mip_base[b]
    assert scene.textures.mip_offset[base] == 0
    assert scene.textures.mip_w[base] == 1 and scene.textures.mip_h[base] == 1
    used = scene.textures.texels.alloc.used()
    scene.textures.free_texture(b)  # idempotent: must not free texel 0
    assert scene.textures.texels.alloc.used() == used
    # texture a is untouched
    base_a = scene.textures.tex_mip_base[a]
    off_a = scene.textures.mip_offset[base_a]
    assert tuple(scene.textures.texels.host[off_a]) == (9, 9, 9, 9)
