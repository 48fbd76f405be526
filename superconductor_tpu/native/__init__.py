"""Native host-side codecs.

Two tiers, mirroring the reference's native texture stack (basis-universal
C++ transcoder + granite BC6H shader, SURVEY.md §2.2):

  * ``libscnative.so`` — in-repo C++ (built on demand via make): BPTC
    (BC6H/BC7) block decode, meshopt vertex/index decode.
  * ``gldecode`` — Mesa llvmpipe via surfaceless EGL as a BPTC decode
    oracle; used as fallback when the C++ library isn't built, and as
    ground truth in tests validating the C++ tables.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libscnative.so")
_lib = None
_lib_tried = False


def load_native():
    """Load (building if necessary) the C++ library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return None
    try:
        if not os.path.exists(_LIB_PATH) or _stale():
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=300,
            )
        _lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        log.warning("scnative build/load failed; using fallbacks", exc_info=True)
        _lib = None
    return _lib


def _stale() -> bool:
    src_dir = os.path.join(_NATIVE_DIR, "src")
    if not os.path.isdir(src_dir):
        return False
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime
        for f in os.listdir(src_dir)
    )
