"""Production-robustness behavior: pass enables derived from scene content,
capacity growth instead of silent truncation, overflow stats reporting.

The reference never drops work: buffers grow x2 on demand (buffers.rs:61-106)
and every blend mode renders unconditionally (rendering.rs:506-558). These
tests pin the TPU build to the same policy."""

import numpy as np
import pytest

from superconductor_tpu.assets.fetch import MemoryClient
from superconductor_tpu.ecs.app import App
from superconductor_tpu.ecs.components import Instance, InstanceOf, ModelUrl
from superconductor_tpu.ecs.components import ModelComponent
from superconductor_tpu.ecs.resources import (
    CameraResource,
    FrameOutput,
    RenderSettings,
)
from superconductor_tpu.ecs.systems import CorePlugin
from superconductor_tpu.math3d import Similarity
from superconductor_tpu.render.frame import RenderConfig

from conftest import make_box_glb


def _make_app(files, **cfg):
    cfg.setdefault("width", 64)
    cfg.setdefault("height", 64)
    cfg.setdefault("raster", "ref")
    app = App()
    app.add_plugin(CorePlugin(config=RenderConfig(**cfg), client=MemoryClient(files)))
    return app


def _load_and_render(app, url):
    w = app.world
    w.resource(CameraResource).camera.position = np.array([0, 0, 2.5], np.float32)
    model_e = w.spawn(ModelUrl(url))
    w.spawn(Instance(Similarity()), InstanceOf(model_e))
    for _ in range(100):
        app.update()
        if w.get(model_e, ModelComponent) is not None:
            break
    app.update()
    return np.asarray(w.resource(FrameOutput).image)[0]


def test_blend_material_renders_with_default_config():
    """A glTF with a BLEND material must render under the default config
    (enable_blend=False) — the ECS derives the enable from the materials."""
    glb = make_box_glb(alpha_mode="BLEND", base_color=(1.0, 0.0, 0.0, 0.5))
    app = _make_app({"box.glb": glb})
    img = _load_and_render(app, "box.glb")
    cfg = app.world.resource(RenderSettings).config
    assert cfg.enable_blend, "enable_blend not derived from scene materials"
    center = img[32, 32]
    # 50% red blended over the default clear color: red present but not full
    assert center[0] > 60, center
    assert center[0] < 250, center


def test_clip_material_renders_with_default_config():
    glb = make_box_glb(alpha_mode="MASK", base_color=(1.0, 0.0, 0.0, 1.0))
    app = _make_app({"box.glb": glb})
    img = _load_and_render(app, "box.glb")
    cfg = app.world.resource(RenderSettings).config
    assert cfg.enable_clip, "enable_clip not derived from scene materials"
    assert img[32, 32, 0] == 255  # alpha 1.0 >= cutoff: fully visible


def test_triangle_capacity_grows_instead_of_truncating():
    """t_cap 4 < the box's 12 triangles: the frame must grow capacity and
    render every triangle, not half a box."""
    glb = make_box_glb()
    small = _make_app({"box.glb": glb}, t_cap=4, v_cap=4)
    img_small = _load_and_render(small, "box.glb")
    cfg = small.world.resource(RenderSettings).config
    assert cfg.t_cap >= 12, cfg.t_cap
    assert cfg.v_cap >= 8, cfg.v_cap

    big = _make_app({"box.glb": glb}, t_cap=64)
    img_big = _load_and_render(big, "box.glb")
    assert np.array_equal(img_small, img_big)


def test_frame_stats_report_bin_pair_need(box_glb):
    """render_frame_stats reports the true bin-pair need on the pallas path
    even when p_cap is too small (the host grows p_cap from this)."""
    import superconductor_tpu as sc
    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.render.frame import render_frame_stats

    scene = sc.Scene()
    model = load_model(scene, box_glb, name="box")
    cam = sc.Camera(position=np.array([0, 0, 2.5], np.float32))
    uni = sc.make_uniforms(cam, 128, 64)
    state = build_frame_state(scene, [(model, sc.Similarity())], uni)

    # pallas on CPU runs in interpret mode; tiny caps keep it fast
    cfg = sc.RenderConfig(width=128, height=64, t_cap=16, p_cap=2, raster="pallas")
    _, stats = render_frame_stats(scene.device_arrays(), state, cfg)
    pairs = int(stats["pairs_needed"])
    assert pairs > 2, pairs  # true need reported despite the tiny cap

    cfg_ok = sc.RenderConfig(
        width=128, height=64, t_cap=16, p_cap=64, raster="pallas"
    )
    img, stats_ok = render_frame_stats(scene.device_arrays(), state, cfg_ok)
    assert int(stats_ok["pairs_needed"]) == pairs
    assert img.shape == (1, 64, 128, 4)


def test_ecs_grows_p_cap_on_pallas_overflow(caplog):
    """ECS render detects bin-pair overflow from the frame stats and
    re-renders with a grown p_cap (pallas interpret mode on CPU)."""
    import logging

    glb = make_box_glb()
    app = _make_app(
        {"box.glb": glb}, width=128, height=64, t_cap=16, p_cap=2,
        raster="pallas",
    )
    with caplog.at_level(logging.WARNING):
        img = _load_and_render(app, "box.glb")
    cfg = app.world.resource(RenderSettings).config
    assert cfg.p_cap > 2, cfg.p_cap
    assert any("frame capacity exceeded" in r.message for r in caplog.records)
    # the re-rendered frame contains the full box
    big = _make_app(
        {"box.glb": glb}, width=128, height=64, t_cap=16, p_cap=256,
        raster="pallas",
    )
    img_big = _load_and_render(big, "box.glb")
    assert np.array_equal(img, img_big)
