"""Async texture streaming: dummy hot-swap + smallest-mip-first loading.

Reproduces the reference's texture pipeline behavior
(texture_loading.rs:76-336 + textures.rs:616-926):

  * materials draw immediately with 1x1 dummy textures;
  * texture fetch+decode runs on the loader thread pool;
  * KTX2 textures stream progressively: the smallest mip level is fetched
    (by byte range) and becomes visible first, then the full mip chain
    replaces it in the background;
  * completion "hot-swaps" by pointing the material's texture id at the
    new pool texture — the analog of MutableBindGroup entry swapping
    (mutable_bind_group.rs:19-29); the swap is applied on the frame thread
    by ``pump()`` so scene mutation stays single-threaded;
  * failures are logged and leave the dummy bound (degrade, never fail).
"""

from __future__ import annotations

import io
import logging
import struct
import threading
from dataclasses import dataclass
from typing import List

import numpy as np

from ..scene.scene import Scene, TEXFLAG_SRGB, WRAP_REPEAT, build_mip_chain
from .fetch import FetchClient

log = logging.getLogger(__name__)


@dataclass
class _PendingSwap:
    material_index: int
    field: str  # 'albedo_tex' | 'normal_tex' | 'metallic_roughness_tex' | 'emissive_tex'
    levels: List[np.ndarray]
    srgb: bool
    wrap: int
    final: bool  # False for the low-res preview phase


class TextureStreamer:
    """Owns in-flight texture loads; ``pump(scene)`` applies finished ones."""

    def __init__(self, client: FetchClient):
        self.client = client
        self._done: List[_PendingSwap] = []
        self._lock = threading.Lock()
        self.inflight = 0
        # dedup by (url, srgb) -> materials waiting (Shared-future analog,
        # texture_loading.rs:249-336)
        self._by_url: dict = {}

    # ------------------------------------------------------------------
    def request(
        self,
        material_index: int,
        field: str,
        url: str,
        srgb: bool,
        wrap: int = WRAP_REPEAT,
    ) -> None:
        key = (url, srgb)
        if key in self._by_url:
            self._by_url[key].append((material_index, field))
            return
        self._by_url[key] = [(material_index, field)]
        self.inflight += 1
        self.client.submit(self._job, url, srgb, wrap, key)

    def _push(self, key, levels, srgb, wrap, final):
        with self._lock:
            for material_index, field in self._by_url.get(key, ()):
                self._done.append(
                    _PendingSwap(material_index, field, levels, srgb, wrap, final)
                )

    def _job(self, url: str, srgb: bool, wrap: int, key) -> None:
        try:
            head = self.client.fetch_bytes_range(url, 0, 4096)
            if head[:12] == b"\xabKTX 20\xbb\r\n\x1a\n":
                self._stream_ktx2(url, srgb, wrap, key, head)
            else:
                data = self.client.fetch_bytes(url)
                from .models import _decode_image

                rgba = _decode_image(data)
                self._push(key, build_mip_chain(rgba), srgb, wrap, True)
        except Exception:
            log.exception("texture stream failed for %s; dummy stays", url)
            with self._lock:
                self._by_url.pop(key, None)
        finally:
            self.inflight -= 1

    def _stream_ktx2(self, url, srgb, wrap, key, head: bytes) -> None:
        """Smallest-mip-first via byte-range reads (textures.rs:784-923)."""
        from .ktx2 import decode_level_images, parse_ktx2

        levels_n = struct.unpack_from("<I", head, 40)[0] or 1
        # level index sits at offset 80
        index = [
            struct.unpack_from("<3Q", head, 80 + i * 24) for i in range(levels_n)
        ]
        # Phase 1: smallest (last) level only.
        off, blen, _ = index[-1]
        smallest = self.client.fetch_bytes_range(url, off, off + blen)
        # Reassemble a buffer where only that level's bytes exist.
        fake = bytearray(head[:80 + 24 * levels_n])
        fake.extend(b"\0" * max(0, off + blen - len(fake)))
        fake[off : off + blen] = smallest
        ktx = parse_ktx2(bytes(fake))
        img = decode_level_images(ktx, levels_n - 1)[0]
        img8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        self._push(key, [img8], srgb, wrap, False)

        # Phase 2: everything.
        data = self.client.fetch_bytes(url)
        ktx = parse_ktx2(data)
        chain = [
            np.clip(
                np.round(decode_level_images(ktx, i)[0] * 255.0), 0, 255
            ).astype(np.uint8)
            for i in range(levels_n)
        ]
        self._push(key, chain, srgb, wrap, True)

    # ------------------------------------------------------------------
    def pump(self, scene: Scene) -> int:
        """Apply finished loads (frame thread). Returns number applied."""
        with self._lock:
            done, self._done = self._done, []
        applied = 0
        swapped_tex: dict = {}
        for swap in done:
            sig = (id(swap.levels), swap.srgb)
            if sig not in swapped_tex:
                swapped_tex[sig] = scene.textures.add_texture(
                    swap.levels,
                    wrap=swap.wrap,
                    flags=TEXFLAG_SRGB if swap.srgb else 0,
                )
            tex_id = swapped_tex[sig]
            mat = scene.materials[swap.material_index]
            setattr(mat, swap.field, tex_id)
            scene._materials_dirty = True
            applied += 1
        return applied

    @property
    def idle(self) -> bool:
        with self._lock:
            return self.inflight == 0 and not self._done
