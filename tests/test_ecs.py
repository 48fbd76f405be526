"""ECS app-layer tests: async loading, instances, animation, full frames."""

import time

import numpy as np

from superconductor_tpu.assets.fetch import MemoryClient
from superconductor_tpu.ecs.app import App, Stage
from superconductor_tpu.ecs.components import (
    AnimatedModelUrl,
    Instance,
    InstanceOf,
    JointsComponent,
    ModelComponent,
    ModelUrl,
)
from superconductor_tpu.ecs.resources import (
    CameraResource,
    FrameOutput,
    RenderSettings,
)
from superconductor_tpu.ecs.systems import CorePlugin
from superconductor_tpu.math3d import Similarity
from superconductor_tpu.render.frame import RenderConfig


def _make_app(files, width=64, height=64, **cfg):
    app = App()
    app.add_plugin(
        CorePlugin(
            config=RenderConfig(
                width=width, height=height, t_cap=64, t_cap_anim=64,
                raster="ref", **cfg,
            ),
            client=MemoryClient(files),
        )
    )
    return app


def _wait_loaded(app, entity, ctype=ModelComponent, frames=100):
    for _ in range(frames):
        app.update()
        if app.world.get(entity, ctype) is not None:
            return True
    return False


def test_ecs_loads_and_renders_model(box_glb):
    app = _make_app({"box.glb": box_glb})
    w = app.world
    w.resource(CameraResource).camera.position = np.array([0, 0, 2.5], np.float32)
    model_e = w.spawn(ModelUrl("box.glb"))
    w.spawn(Instance(Similarity()), InstanceOf(model_e))
    assert _wait_loaded(app, model_e)
    app.update()
    img = np.asarray(w.resource(FrameOutput).image)[0]
    # unlit red box visible in the middle
    assert img[32, 32, 0] == 255


def test_ecs_animated_model_skins(skinned_glb):
    app = _make_app({"ribbon.glb": skinned_glb})
    w = app.world
    cam = w.resource(CameraResource).camera
    cam.position = np.array([0.0, 1.0, 4.0], np.float32)
    model_e = w.spawn(AnimatedModelUrl("ribbon.glb"))
    inst_e = w.spawn(Instance(Similarity()), InstanceOf(model_e))
    assert _wait_loaded(app, model_e)
    # a few frames so joints attach + animation starts sampling
    app.update()
    jc = w.get(inst_e, JointsComponent)
    assert jc is not None and jc.palette is not None
    assert jc.palette.shape == (2, 8)

    img0 = np.asarray(w.resource(FrameOutput).image)[0].astype(int)

    # Advance to t=1.0 (90deg bend at the top joint): the ribbon's top
    # should sweep sideways -> the rendered green pixels move.
    jc.time = 0.999
    app.update()
    img1 = np.asarray(w.resource(FrameOutput).image)[0].astype(int)

    g0 = img0[..., 1] > 200
    g1 = img1[..., 1] > 200
    assert g0.sum() > 10 and g1.sum() > 10
    # the set of green pixels must have shifted substantially
    moved = np.logical_xor(g0, g1).sum() / max(g0.sum(), 1)
    assert moved > 0.3

    # palette rotation actually applied to joint 1 (quaternion z component)
    jc2 = w.get(inst_e, JointsComponent)
    assert abs(jc2.palette[1, 6]) > 0.5  # sin(45deg) ~ 0.707 about z


def test_ecs_bad_url_degrades(box_glb):
    app = _make_app({"box.glb": box_glb})
    w = app.world
    bad_e = w.spawn(ModelUrl("missing.glb"))
    ok_e = w.spawn(ModelUrl("box.glb"))
    w.spawn(Instance(Similarity()), InstanceOf(ok_e))
    assert _wait_loaded(app, ok_e)
    # missing model never materializes but nothing crashes
    assert w.get(bad_e, ModelComponent) is None
    img = np.asarray(w.resource(FrameOutput).image)
    assert img is not None


def test_debug_line_systems(skinned_glb, box_glb):
    from superconductor_tpu.ecs.app import Stage
    from superconductor_tpu.ecs.debugging import (
        push_bounding_boxes_to_lines,
        push_joints_to_lines,
    )
    from superconductor_tpu.ecs.resources import LineBuffer

    app = _make_app(
        {"ribbon.glb": skinned_glb, "box.glb": box_glb},
        enable_lines=True,
    )
    app.add_system(Stage.INSTANCE_BUFFERING, push_joints_to_lines)
    app.add_system(Stage.INSTANCE_BUFFERING, push_bounding_boxes_to_lines)
    w = app.world
    w.resource(CameraResource).camera.position = np.array([0, 1, 4], np.float32)
    skinned_e = w.spawn(AnimatedModelUrl("ribbon.glb"))
    box_e = w.spawn(ModelUrl("box.glb"))
    w.spawn(Instance(Similarity()), InstanceOf(skinned_e))
    w.spawn(Instance(Similarity(translation=[2, 0, 0])), InstanceOf(box_e))
    assert _wait_loaded(app, skinned_e)
    assert _wait_loaded(app, box_e)
    app.update()
    # skeleton: 2 bone links; bboxes: 12 edges per primitive x 2 models
    lines = w.resource(LineBuffer)
    assert len(lines.segments) == 2 + 12 * 2
    img = np.asarray(w.resource(FrameOutput).image)
    assert img is not None


def test_ecs_stereo_renders_two_eyes(box_glb):
    """num_views=2 drives the WebXR-uniform analog: two eye images with
    parallax, per-eye culling unioned (resources.rs:166-184)."""
    app = _make_app({"box.glb": box_glb}, num_views=2)
    w = app.world
    w.resource(CameraResource).camera.position = np.array(
        [0, 0, 1.2], np.float32
    )
    w.resource(CameraResource).ipd = 0.3  # exaggerate parallax
    model_e = w.spawn(ModelUrl("box.glb"))
    w.spawn(Instance(Similarity()), InstanceOf(model_e))
    assert _wait_loaded(app, model_e)
    app.update()
    img = np.asarray(w.resource(FrameOutput).image)
    assert img.shape[0] == 2
    left, right = img[0], img[1]
    assert (left[..., 0] == 255).any() and (right[..., 0] == 255).any()
    assert (left != right).mean() > 0.005  # parallax shifts the box


def test_ecs_zero_read_mode_matches_default(box_glb):
    """stats_interval=0 (zero device->host reads on the frame loop, for
    readback-hostile transports) must render the identical image via the
    stats-free executable; pending_stats stays unset."""
    imgs = {}
    for interval in (1, 0):
        app = _make_app({"box.glb": box_glb})
        w = app.world
        w.resource(RenderSettings).stats_interval = interval
        w.resource(CameraResource).camera.position = np.array(
            [0, 0, 2.5], np.float32
        )
        model_e = w.spawn(ModelUrl("box.glb"))
        w.spawn(Instance(Similarity()), InstanceOf(model_e))
        assert _wait_loaded(app, model_e)
        app.update()
        out = w.resource(FrameOutput)
        if interval == 0:
            assert out.pending_stats is None
        imgs[interval] = np.asarray(out.image)
    np.testing.assert_array_equal(imgs[0], imgs[1])
