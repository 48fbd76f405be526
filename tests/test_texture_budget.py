"""Texture residency budget + degrade ladder (VERDICT r3 #5).

The reference stays near 1 byte/texel by keeping BC/ASTC compressed in
VRAM (textures.rs:929-1153) and downscales when a texture exceeds the
device limit (downscaling_for_max_size, textures.rs:609-614). The TPU
build decodes to flat pools and buys shade speed with quad/SH packed
pools; Scene.texture_budget_bytes bounds that expansion: over budget it
drops the speed pools first (pure perf trade), then caps future loads'
resolution — never OOMs, never silently evicts.
"""

import numpy as np
import pytest

import superconductor_tpu as sc
from superconductor_tpu.scene.scene import build_mip_chain


def _filled_scene(n=4, size=64):
    scene = sc.Scene()
    rng = np.random.default_rng(0)
    for _ in range(n):
        img = rng.integers(0, 255, (size, size, 4), np.uint8)
        scene.textures.add_texture(build_mip_chain(img))
    return scene


def test_report_carries_totals_and_budget():
    scene = _filled_scene()
    rep = scene.texture_memory_report()
    assert rep["total_device_bytes"] == scene.projected_texture_bytes()
    assert rep["total_device_bytes"] > 0
    assert rep["budget_bytes"] is None
    scene.texture_budget_bytes = 1
    rep = scene.texture_memory_report()
    assert rep["over_budget"] is True
    assert rep["degrade"] == {
        "quad_dropped": False, "matq_dropped": False, "mq3_dropped": False,
        "max_size_set": None,
    }


def test_projected_bytes_quad_factor():
    scene = _filled_scene()
    with_quad = scene.projected_texture_bytes(quad=True)
    without = scene.projected_texture_bytes(quad=False)
    # quad pool = 4x texels + 12 B/texel neighbor table on top of flat
    assert with_quad > without * 4


def test_budget_drops_quad_pools_first():
    scene = _filled_scene()
    flat = scene.projected_texture_bytes(quad=False)
    # budget admits the flat pools but not the quad pools
    scene.texture_budget_bytes = flat + 1
    scene.enforce_texture_budget()
    assert scene.quad_pools is False
    assert scene._budget_state["quad_dropped"] is True
    assert scene.projected_texture_bytes() <= scene.texture_budget_bytes
    # max_texture_size untouched: the first rung sufficed
    assert scene.max_texture_size is None
    rep = scene.texture_memory_report()
    assert rep["over_budget"] is False
    assert rep["degrade"]["quad_dropped"] is True


def test_budget_caps_future_load_resolution():
    scene = _filled_scene(size=128)
    scene.texture_budget_bytes = 1024  # nothing fits
    scene.enforce_texture_budget()
    assert scene.quad_pools is False
    # future loads downscale: cap = half the largest resident dimension
    assert scene.max_texture_size == 64
    # idempotent: a second call does not shrink further by itself
    scene.enforce_texture_budget()
    assert scene.max_texture_size == 64


def test_device_arrays_enforces_budget():
    scene = _filled_scene()
    scene.texture_budget_bytes = scene.projected_texture_bytes(quad=False) + 1
    d = scene.device_arrays()
    assert "texels_q" not in d  # quad pool degraded away before publish
    assert scene.quad_pools is False


def test_within_budget_changes_nothing():
    scene = _filled_scene()
    scene.texture_budget_bytes = scene.projected_texture_bytes() + 1
    scene.enforce_texture_budget()
    assert scene.quad_pools is True
    assert scene.max_texture_size is None
    d = scene.device_arrays()
    assert "texels_q" in d


def test_degraded_scene_still_renders():
    """quad-dropped publish renders pixel-identically to the quad path
    (flat-pool taps fetch the same texels)."""
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
    )

    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    uni = sc.make_uniforms(cam, 96, 96)
    env = sc.EnvBindings(ambient_sh=default_ambient_sh())
    cfg = sc.RenderConfig(width=96, height=96, raster="ref")
    state = build_frame_state(scene, [(model, sc.Similarity())], uni)

    img_quad = np.asarray(
        sc.render_frame(scene.device_arrays(), state, cfg, env)
    )
    scene.texture_budget_bytes = scene.projected_texture_bytes(quad=False) + 1
    dev = scene.device_arrays()
    assert "texels_q" not in dev
    img_flat = np.asarray(sc.render_frame(dev, state, cfg, env))
    np.testing.assert_array_equal(img_quad, img_flat)
