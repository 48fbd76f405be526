"""Native C++ codec conformance: BPTC decoders vs the Mesa GL oracle."""

import numpy as np
import pytest


def _gl_available():
    try:
        from superconductor_tpu.native.gldecode import decode_bc7_gl

        decode_bc7_gl(bytes(16), 4, 4)
        return True
    except Exception:
        return False


def _lib():
    from superconductor_tpu.native import load_native

    return load_native()


@pytest.mark.skipif(not _gl_available(), reason="EGL/Mesa unavailable")
def test_bc7_matches_oracle():
    lib = _lib()
    if lib is None:
        pytest.skip("scnative not built")
    from superconductor_tpu.native.bc7 import decode_bc7
    from superconductor_tpu.native.gldecode import decode_bc7_gl

    rng = np.random.default_rng(123)
    for _ in range(300):
        block = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(
            decode_bc7(block, 4, 4), decode_bc7_gl(block, 4, 4)
        )


@pytest.mark.skipif(not _gl_available(), reason="EGL/Mesa unavailable")
def test_bc6h_matches_oracle():
    lib = _lib()
    if lib is None:
        pytest.skip("scnative not built")
    from superconductor_tpu.native.bc6h import decode_bc6h
    from superconductor_tpu.native.gldecode import decode_bc6h_gl

    rng = np.random.default_rng(321)
    for _ in range(300):
        block = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(
            decode_bc6h(block, 4, 4), decode_bc6h_gl(block, 4, 4)
        )


def test_bc6h_cubemap_decodes():
    """The reference noon.ktx2 IBL cubemap decodes to sane HDR."""
    import os

    path = "/root/reference/demo/web/assets/cubemaps/noon.ktx2"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    from superconductor_tpu.assets.ktx2 import decode_level_images, parse_ktx2

    ktx = parse_ktx2(open(path, "rb").read())
    faces = decode_level_images(ktx, 0)
    assert len(faces) == 6
    stack = np.stack(faces)
    assert np.isfinite(stack).all()
    assert 0.0 <= stack[..., :3].min()
    assert 0.5 < stack[..., :3].max() < 1e5  # HDR sky (sun peaks ~1.5k)
    # mip consistency: downsampled mip0 ~ mip1
    m1 = decode_level_images(ktx, 1)[0][..., :3]
    down = faces[0][..., :3].reshape(128, 2, 128, 2, 3).mean((1, 3))
    corr = np.corrcoef(down.ravel(), m1.ravel())[0, 1]
    assert corr > 0.95


@pytest.mark.skipif(not _gl_available(), reason="EGL/Mesa unavailable")
def test_bc6h_signed_matches_oracle():
    lib = _lib()
    if lib is None:
        pytest.skip("scnative not built")
    from superconductor_tpu.native.bc6h import decode_bc6h
    from superconductor_tpu.native.gldecode import decode_bc6h_gl

    rng = np.random.default_rng(777)
    for _ in range(200):
        block = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(
            decode_bc6h(block, 4, 4, signed=True),
            decode_bc6h_gl(block, 4, 4, signed=True),
        )
