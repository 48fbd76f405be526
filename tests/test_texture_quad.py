"""Quad-packed texel pool (TexturePool.device_quad) parity tests.

The quad pool bakes each texel's 2x2 bilinear footprint [self, right,
down, diag] (wrap applied) into one (N, 16) row so a bilinear tap is ONE
gather instead of four (ops/texture.py sample_bilinear_level). The two
fetch paths must be bit-exact equals — same texel values, same lerp — so
every golden/oracle test keeps passing unchanged on either path.
(Exception: CLAMP wrap with a negative base texel weights the edge texel
via a zeroed fraction instead of two equal taps — same value, ulp-level
association difference — so comparisons allow atol=1e-5-scale slack
while interior samples assert exact equality.)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from superconductor_tpu.ops.texture import (  # noqa: E402
    sample_anisotropic,
    sample_bilinear_level,
    sample_trilinear,
)
from superconductor_tpu.scene.scene import (  # noqa: E402
    WRAP_CLAMP,
    WRAP_REPEAT,
    TexturePool,
)


def _mip_chain(rng, h, w):
    levels = []
    while True:
        levels.append(rng.integers(0, 256, (h, w, 4), np.uint8))
        if h == 1 and w == 1:
            return levels
        h, w = max(1, h // 2), max(1, w // 2)


def _make_pool(rng):
    pool = TexturePool(np.uint8)
    ids = [
        pool.add_texture(_mip_chain(rng, 8, 16), wrap=WRAP_REPEAT),
        pool.add_texture(_mip_chain(rng, 7, 5), wrap=WRAP_CLAMP),  # non-pow2
        pool.add_texture([rng.integers(0, 256, (1, 1, 4), np.uint8)]),  # 1x1
        pool.add_texture(_mip_chain(rng, 16, 4), wrap=WRAP_REPEAT),
    ]
    return pool, ids


def _sample_both(pool, tex_id, uv, lvl, sampler=sample_bilinear_level, **kw):
    desc = pool.device_descriptors()
    flat = pool.texels.device()
    quad = pool.device_quad()
    tid = jnp.full((uv.shape[0],), tex_id, jnp.int32)
    a = sampler(flat, desc, tid, jnp.asarray(uv), lvl, **kw)
    b = sampler(quad, desc, tid, jnp.asarray(uv), lvl, **kw)
    return np.asarray(a), np.asarray(b)


def test_quad_bilinear_bit_exact():
    rng = np.random.default_rng(7)
    pool, ids = _make_pool(rng)
    uv = rng.uniform(-1.5, 2.5, (512, 2)).astype(np.float32)  # incl. wrap
    for tex_id in ids:
        for level in (0, 1, 3):
            lvl = jnp.full((512,), level, jnp.int32)
            a, b = _sample_both(pool, tex_id, uv, lvl)
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    # interior uvs: bit-exact (the hot path, no edge-association slack)
    uv_in = rng.uniform(0.2, 0.8, (256, 2)).astype(np.float32)
    a, b = _sample_both(pool, ids[0], uv_in, jnp.zeros((256,), jnp.int32))
    np.testing.assert_array_equal(a, b)


def test_quad_trilinear_and_aniso_bit_exact():
    rng = np.random.default_rng(8)
    pool, ids = _make_pool(rng)
    p = 256
    uv = rng.uniform(0.0, 1.0, (p, 2)).astype(np.float32)
    lod = jnp.asarray(rng.uniform(0.0, 3.0, (p,)).astype(np.float32))
    a, b = _sample_both(pool, ids[0], uv, lod, sampler=sample_trilinear)
    np.testing.assert_array_equal(a, b)
    duvdx = jnp.asarray(rng.normal(0, 0.01, (p, 2)).astype(np.float32))
    duvdy = jnp.asarray(rng.normal(0, 0.002, (p, 2)).astype(np.float32))
    desc = pool.device_descriptors()
    tid = jnp.zeros((p,), jnp.int32)
    a = sample_anisotropic(
        pool.texels.device(), desc, tid, jnp.asarray(uv), duvdx, duvdy, 4
    )
    b = sample_anisotropic(
        pool.device_quad(), desc, tid, jnp.asarray(uv), duvdx, duvdy, 4
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quad_tracks_content_updates():
    """replace_texture / write_level must be visible through device_quad
    (the MutableBindGroup hot-swap path streams texture content in-place)."""
    rng = np.random.default_rng(9)
    pool, ids = _make_pool(rng)
    _ = pool.device_quad()  # build once (cache primed)
    new0 = rng.integers(0, 256, (8, 16, 4), np.uint8)
    pool.write_level(ids[0], 0, new0)
    uv = rng.uniform(0, 1, (128, 2)).astype(np.float32)
    lvl = jnp.zeros((128,), jnp.int32)
    a, b = _sample_both(pool, ids[0], uv, lvl)
    np.testing.assert_array_equal(a, b)
    # and the quad really reflects the new content, not the cached old one
    exact = sample_bilinear_level(
        pool.device_quad(),
        pool.device_descriptors(),
        jnp.zeros((1,), jnp.int32) + ids[0],
        jnp.asarray([[0.5 / 16, 0.5 / 8]], np.float32),  # texel (0,0) center
        jnp.zeros((1,), jnp.int32),
        decode_srgb=False,
    )
    np.testing.assert_allclose(
        np.asarray(exact)[0], new0[0, 0].astype(np.float32) / 255.0, atol=1e-6
    )


def test_quad_free_and_realloc():
    """Freeing a texture and reallocating its pool range must rebuild the
    neighbor rows for the new layout (different w/h over the same range)."""
    rng = np.random.default_rng(10)
    pool = TexturePool(np.uint8)
    a = pool.add_texture([rng.integers(0, 256, (8, 8, 4), np.uint8)],
                         wrap=WRAP_REPEAT)
    pool.free_texture(a)
    b = pool.add_texture([rng.integers(0, 256, (4, 16, 4), np.uint8)],
                         wrap=WRAP_CLAMP)  # same texel count, new shape
    uv = rng.uniform(-0.5, 1.5, (256, 2)).astype(np.float32)
    lvl = jnp.zeros((256,), jnp.int32)
    xa, xb = _sample_both(pool, b, uv, lvl)
    np.testing.assert_allclose(xa, xb, rtol=1e-6, atol=1e-6)


def test_quad_f16_hdr_pool():
    rng = np.random.default_rng(11)
    pool = TexturePool(np.float16)
    t = pool.add_texture(
        [rng.uniform(0, 20, (6, 10, 4)).astype(np.float16)], wrap=WRAP_CLAMP
    )
    uv = rng.uniform(-0.2, 1.2, (128, 2)).astype(np.float32)
    lvl = jnp.zeros((128,), jnp.int32)
    a, b = _sample_both(pool, t, uv, lvl, decode_srgb=False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_scene_publishes_quad_pools():
    from superconductor_tpu.scene.scene import Scene

    s = Scene()
    d = s.device_arrays()
    assert d["texels_q"].shape == (d["texels"].shape[0], 16)
    assert d["texels_hdr_q"].shape == (d["texels_hdr"].shape[0], 16)
    s2 = Scene()
    s2.quad_pools = False
    d2 = s2.device_arrays()
    assert "texels_q" not in d2 and "texels_hdr_q" not in d2
    rep = s.texture_memory_report()
    assert rep["ldr"]["quad_pool_bytes"] > 0
    rep2 = s2.texture_memory_report()
    assert rep2["ldr"]["quad_pool_bytes"] == 0


def test_trilinear_pair_row_bit_exact():
    """The fused trilinear path (ONE mip_owh2 pair-row gather for both
    levels) must be bit-exact vs the two-bilinear-call path, including
    deep lod (clamped to the last mip, which pairs with itself), lod
    beyond the chain, and streaming mip views (suffix of the chain)."""
    rng = np.random.default_rng(9)
    pool, ids = _make_pool(rng)
    desc = pool.device_descriptors()
    desc_nopair = {k: v for k, v in desc.items() if k != "mip_owh2"}
    assert "mip_owh2" in desc
    quad = pool.device_quad()
    p = 512
    uv = rng.uniform(-0.5, 1.5, (p, 2)).astype(np.float32)
    for tex_id in ids:
        for lo, hi in ((0.0, 3.0), (2.5, 12.0)):  # interior + deep clamp
            lod = jnp.asarray(rng.uniform(lo, hi, (p,)).astype(np.float32))
            tid = jnp.full((p,), tex_id, jnp.int32)
            a = sample_trilinear(quad, desc, tid, jnp.asarray(uv), lod)
            b = sample_trilinear(quad, desc_nopair, tid, jnp.asarray(uv), lod)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # streaming mip view: only the coarsest 2 mips visible
    full_base = pool.tex_mip_base[ids[0]]
    full_count = pool.tex_mip_count[ids[0]]
    pool.set_mip_view(ids[0], full_base + full_count - 2, 2)
    desc_v = pool.device_descriptors()
    desc_v_nopair = {k: v for k, v in desc_v.items() if k != "mip_owh2"}
    lod = jnp.asarray(rng.uniform(0.0, 4.0, (p,)).astype(np.float32))
    tid = jnp.full((p,), ids[0], jnp.int32)
    a = sample_trilinear(quad, desc_v, tid, jnp.asarray(uv), lod)
    b = sample_trilinear(quad, desc_v_nopair, tid, jnp.asarray(uv), lod)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
