"""BPTC (BC6H/BC7) decode through Mesa llvmpipe (surfaceless EGL).

The reference decodes BC6H with a fragment shader when the device lacks
native BPTC (granite-shaders/bc6.frag) and transcodes UASTC with the
basis-universal C++ library. Here the host GL stack does the equivalent
job: upload the compressed texture, read back decompressed texels. Pure
CPU (llvmpipe), no GPU needed, and it doubles as the conformance oracle
for the in-repo C++ decoder.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

GL_TEXTURE_2D = 0x0DE1
GL_RGBA = 0x1908
GL_RGB = 0x1907
GL_UNSIGNED_BYTE = 0x1401
GL_FLOAT = 0x1406
GL_COMPRESSED_RGBA_BPTC_UNORM = 0x8E8C
GL_COMPRESSED_SRGB_ALPHA_BPTC_UNORM = 0x8E8D
GL_COMPRESSED_RGB_BPTC_SIGNED_FLOAT = 0x8E8E
GL_COMPRESSED_RGB_BPTC_UNSIGNED_FLOAT = 0x8E8F

_lock = threading.Lock()
_state = None


class _GlContext:
    def __init__(self):
        self.egl = ctypes.CDLL("libEGL.so.1")
        self.gl = ctypes.CDLL("libGL.so.1")
        egl = self.egl
        EGL_PLATFORM_SURFACELESS_MESA = 0x31DD
        egl.eglGetPlatformDisplay.restype = ctypes.c_void_p
        self.dpy = ctypes.c_void_p(
            egl.eglGetPlatformDisplay(EGL_PLATFORM_SURFACELESS_MESA, None, None)
        )
        if not self.dpy:
            raise RuntimeError("no EGL display")
        if not egl.eglInitialize(self.dpy, None, None):
            raise RuntimeError("eglInitialize failed")
        egl.eglBindAPI(0x30A2)  # OPENGL_API
        attribs = (ctypes.c_int * 5)(0x3040, 0x0008, 0x3033, 0, 0x3038)
        cfg = ctypes.c_void_p()
        n = ctypes.c_int()
        egl.eglChooseConfig(self.dpy, attribs, ctypes.byref(cfg), 1, ctypes.byref(n))
        if n.value < 1:
            raise RuntimeError("no EGL config")
        egl.eglCreateContext.restype = ctypes.c_void_p
        self.ctx = ctypes.c_void_p(egl.eglCreateContext(self.dpy, cfg, None, None))
        if not self.ctx:
            raise RuntimeError("eglCreateContext failed")
        if not egl.eglMakeCurrent(self.dpy, None, None, self.ctx):
            raise RuntimeError("eglMakeCurrent failed")


def _get() -> _GlContext:
    global _state
    if _state is None:
        _state = _GlContext()
    return _state


def _decode(payload: bytes, width: int, height: int, internal_format: int,
            out_format: int, out_type: int, channels: int, dtype,
            block_bytes: int = 16) -> np.ndarray:
    with _lock:
        g = _get()
        gl = g.gl
        tex = ctypes.c_uint()
        gl.glGenTextures(1, ctypes.byref(tex))
        gl.glBindTexture(GL_TEXTURE_2D, tex)
        bw = (width + 3) // 4
        bh = (height + 3) // 4
        expected = bw * bh * block_bytes
        if len(payload) < expected:
            payload = payload + b"\0" * (expected - len(payload))
        gl.glCompressedTexImage2D(
            GL_TEXTURE_2D, 0, internal_format, width, height, 0, expected, payload
        )
        err = gl.glGetError()
        if err:
            gl.glDeleteTextures(1, ctypes.byref(tex))
            raise RuntimeError(f"glCompressedTexImage2D error {err:#x}")
        out = np.zeros((height, width, channels), dtype)
        gl.glPixelStorei(0x0D05, 1)  # PACK_ALIGNMENT
        gl.glGetTexImage(
            GL_TEXTURE_2D, 0, out_format, out_type,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        err = gl.glGetError()
        gl.glDeleteTextures(1, ctypes.byref(tex))
        if err:
            raise RuntimeError(f"glGetTexImage error {err:#x}")
        return out


def decode_bc7_gl(payload: bytes, width: int, height: int) -> np.ndarray:
    """(h, w, 4) uint8."""
    return _decode(
        payload, width, height, GL_COMPRESSED_RGBA_BPTC_UNORM,
        GL_RGBA, GL_UNSIGNED_BYTE, 4, np.uint8,
    )


def decode_bc6h_gl(payload: bytes, width: int, height: int, signed=False) -> np.ndarray:
    """(h, w, 4) float32 (alpha set to 1)."""
    fmt = (
        GL_COMPRESSED_RGB_BPTC_SIGNED_FLOAT
        if signed
        else GL_COMPRESSED_RGB_BPTC_UNSIGNED_FLOAT
    )
    rgb = _decode(payload, width, height, fmt, GL_RGB, GL_FLOAT, 3, np.float32)
    return np.concatenate(
        [rgb, np.ones((height, width, 1), np.float32)], axis=-1
    )


GL_COMPRESSED_RGBA_ASTC_4x4 = 0x93B0
GL_COMPRESSED_SRGB8_ALPHA8_ASTC_4x4 = 0x93D0


def decode_astc4x4_gl(payload: bytes, width: int, height: int, srgb=False) -> np.ndarray:
    """(h, w, 4) uint8 — ASTC 4x4 LDR via GL_KHR_texture_compression_astc_ldr."""
    fmt = GL_COMPRESSED_SRGB8_ALPHA8_ASTC_4x4 if srgb else GL_COMPRESSED_RGBA_ASTC_4x4
    return _decode(payload, width, height, fmt, GL_RGBA, GL_UNSIGNED_BYTE, 4, np.uint8)


GL_COMPRESSED_RGB8_ETC2 = 0x9274


def decode_etc2_gl(payload: bytes, width: int, height: int) -> np.ndarray:
    """(h, w, 3) uint8 — ETC2 RGB8 (8-byte blocks). ETC1 blocks are valid
    ETC2 payloads, which makes this the independent oracle for the ETC1S
    block layer (assets/basislz.py pack_etc1_blocks). Readback is RGBA
    (Mesa's _mesa_decompress_image rejects a GL_RGB readback of ETC2)."""
    out = _decode(
        payload, width, height, GL_COMPRESSED_RGB8_ETC2,
        GL_RGBA, GL_UNSIGNED_BYTE, 4, np.uint8, block_bytes=8,
    )
    return out[..., :3]
