"""Native (C++) draw builder vs the numpy reference path.

src/framestate.cpp mirrors build_frame_state's compose/cull/LOD/pack walk;
every DrawList column must come out identical for the same inputs across
randomized scenes with culling, LOD chains, animated primitives, and joint
palettes.
"""

import os

import numpy as np
import pytest

import superconductor_tpu as sc
import superconductor_tpu.render.draws as D
from superconductor_tpu.render.culling import sphere_culling_params
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.utils.procgen import add_pbr_sphere, add_skinned_tube

from conftest import make_box_glb


def _assert_states_equal(a, b):
    for which in ("draws_static", "draws_animated"):
        da, db = getattr(a, which), getattr(b, which)
        for f in ("sim8", "first_tri", "tri_count", "first_vertex",
                  "vertex_count", "joints_offset", "material",
                  "lightmapped", "valid"):
            va, vb = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
            assert va.dtype == vb.dtype, (which, f, va.dtype, vb.dtype)
            assert np.array_equal(va, vb), (which, f)
    assert np.array_equal(a.joint_palette, b.joint_palette)


def _both_paths(scene, instances, uniforms, **kw):
    assert D._framestate_native(), "native library must be available"
    native = build_frame_state(scene, instances, uniforms, **kw)
    os.environ["SC_TPU_NO_NATIVE_DRAWS"] = "1"
    try:
        ref = build_frame_state(scene, instances, uniforms, **kw)
    finally:
        del os.environ["SC_TPU_NO_NATIVE_DRAWS"]
    return native, ref


def test_native_draws_matches_numpy_basic():
    from superconductor_tpu.assets.models import load_model

    scene = sc.Scene()
    sphere = add_pbr_sphere(scene, stacks=6, slices=6)
    box = load_model(scene, make_box_glb(), name="box")
    tube = add_skinned_tube(scene, segments=4, slices=6, name="tube")

    rng = np.random.default_rng(7)
    instances = []
    models = [sphere, box, tube]
    for i in range(40):
        m = models[i % 3]
        instances.append(
            (m, sc.Similarity(
                translation=rng.uniform(-20, 20, 3).astype(np.float32),
                scale=float(rng.uniform(0.2, 3.0)),
                rotation=_rand_quat(rng),
            ))
        )
    cam = sc.Camera(position=np.array([0, 0, 10.0], np.float32))
    uniforms = sc.make_uniforms(cam, 640, 480)
    palettes = {
        i: np.tile(
            np.array([0, 0, 0, 1, 0, 0, 0, 1], np.float32), (5, 1)
        ) * (1 + 0.01 * i)
        for i, (m, _s) in enumerate(instances)
        if m is tube
    }

    vp = np.asarray(uniforms.projection[0]) @ np.asarray(uniforms.view[0])
    cull = [sphere_culling_params(vp)]

    native, ref = _both_paths(
        scene, instances, uniforms,
        joint_palettes=palettes, cull_params=cull,
    )
    _assert_states_equal(native, ref)
    # sanity: culling actually rejected something and kept something
    v = np.asarray(native.draws_static.valid)
    assert 0 < v.sum()


def test_native_draws_matches_numpy_lod_chains():
    from test_lod import make_lod_glb
    from superconductor_tpu.assets.models import load_model

    scene = sc.Scene()
    lod_model = load_model(scene, make_lod_glb(), name="lod")
    sphere = add_pbr_sphere(scene, stacks=4, slices=4)
    rng = np.random.default_rng(3)
    instances = []
    for i in range(30):
        m = lod_model if i % 2 else sphere
        instances.append(
            (m, sc.Similarity(
                translation=[0, 0, -float(rng.uniform(0.5, 400.0))],
                scale=float(rng.uniform(0.5, 2.0)),
            ))
        )
    # guarantee both LOD levels appear: one lod_model right in front of the
    # camera (high coverage -> LOD 0) on top of the random far spread
    instances.append(
        (lod_model, sc.Similarity(translation=[0, 0, 0.0], scale=2.0))
    )
    cam = sc.Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = sc.make_uniforms(cam, 640, 480)
    native, ref = _both_paths(scene, instances, uniforms)
    _assert_states_equal(native, ref)
    # distance spread must actually exercise both LOD levels
    tc = np.asarray(native.draws_static.tri_count)
    valid = np.asarray(native.draws_static.valid)
    assert {1, 2} <= set(tc[valid].tolist())


def test_native_draws_empty_and_all_culled():
    scene = sc.Scene()
    sphere = add_pbr_sphere(scene, stacks=4, slices=4)
    cam = sc.Camera(position=np.array([0, 0, 5.0], np.float32))
    uniforms = sc.make_uniforms(cam, 64, 64)
    vp = np.asarray(uniforms.projection[0]) @ np.asarray(uniforms.view[0])
    cull = [sphere_culling_params(vp)]
    # instance far behind the camera: everything culled
    instances = [(sphere, sc.Similarity(translation=[0, 0, 500.0]))]
    native, ref = _both_paths(scene, instances, uniforms, cull_params=cull)
    _assert_states_equal(native, ref)
    assert not np.asarray(native.draws_static.valid).any()


def _rand_quat(rng):
    q = rng.normal(size=4).astype(np.float32)
    return q / np.linalg.norm(q)


def test_native_joint_update_matches_python():
    """sc_joint_update (the C++ hierarchy walk) must reproduce the Python
    parent-first Similarity composition on a random multi-root tree."""
    import superconductor_tpu.animation as A
    from superconductor_tpu.animation import AnimationJoints
    from superconductor_tpu.nodes import ChildLink, DepthFirstNodes

    rng = np.random.default_rng(11)
    N = 40

    def rand_sim():
        q = rng.normal(size=4).astype(np.float32)
        return sc.Similarity(
            translation=rng.normal(size=3).astype(np.float32),
            scale=float(rng.uniform(0.5, 2.0)),
            rotation=q / np.linalg.norm(q),
        )

    roots = [0, 1]
    children = [
        ChildLink(index=i, parent=int(rng.integers(0, i)))
        for i in range(2, N)
    ]
    df = DepthFirstNodes(roots=roots, children=children)
    locals_ = [rand_sim() for _ in range(N)]

    native = AnimationJoints(locals_)
    native.update(df)
    assert A._joint_update_fn not in (None, False), "native path must load"

    python = AnimationJoints(locals_)
    saved = A._joint_update_fn
    A._joint_update_fn = False
    try:
        python.update(df)
    finally:
        A._joint_update_fn = saved

    for f in ("global_translation", "global_scale", "global_rotation"):
        a, b = getattr(native, f), getattr(python, f)
        assert np.allclose(a, b, atol=1e-6), (f, np.abs(a - b).max())


def test_joint_palettes_batch_matches_per_instance():
    """The batched palette helper must equal per-instance AnimationJoints
    palettes (modulo the final quat normalize)."""
    from superconductor_tpu.animation import (
        AnimationJoints,
        joint_palettes_batch,
    )
    from superconductor_tpu.nodes import ChildLink, DepthFirstNodes

    rng = np.random.default_rng(4)
    N, I = 12, 5
    df = DepthFirstNodes(
        roots=[0],
        children=[ChildLink(index=i, parent=i - 1) for i in range(1, N)],
    )
    lt = rng.normal(size=(I, N, 3)).astype(np.float32)
    ls = rng.uniform(0.5, 2.0, size=(I, N)).astype(np.float32)
    lr = rng.normal(size=(I, N, 4)).astype(np.float32)
    lr /= np.linalg.norm(lr, axis=-1, keepdims=True)
    ib = rng.normal(size=(N, 8)).astype(np.float32)
    ib[:, 4:8] /= np.linalg.norm(ib[:, 4:8], axis=-1, keepdims=True)
    jn = np.arange(N)

    batch = joint_palettes_batch(
        lt, ls, lr, np.zeros(1, np.int32),
        np.arange(N - 1, dtype=np.int32), np.arange(1, N, dtype=np.int32),
        jn, ib,
    )
    if batch is None:
        import pytest

        pytest.skip("native library unavailable")
    for i in range(I):
        aj = AnimationJoints([sc.Similarity() for _ in range(N)])
        aj.local_translation[:] = lt[i]
        aj.local_scale[:] = ls[i]
        aj.local_rotation[:] = lr[i]
        pal = aj.joint_palette(jn, ib, df)
        assert np.allclose(batch[i], pal, atol=1e-5), i


def test_native_animate_matches_python():
    """sc_anim_sample must reproduce Channel.sample semantics across
    STEP/LINEAR (incl. quaternion slerp)/CUBIC_SPLINE channels and at
    boundary/out-of-range times (which keep the rest pose)."""
    import superconductor_tpu.animation as A
    from superconductor_tpu.animation import (
        CUBIC_SPLINE,
        LINEAR,
        STEP,
        Animation,
        AnimationJoints,
        Channel,
    )

    rng = np.random.default_rng(0)
    J, K = 20, 16
    times = np.linspace(0.0, 2.0, K).astype(np.float32)
    anim = Animation(total_time=2.0)
    for j in range(J):
        interp = [STEP, LINEAR, CUBIC_SPLINE][j % 3]
        n = 3 * K if interp == CUBIC_SPLINE else K
        anim.translation_channels.append(
            Channel(interpolation=interp, inputs=times,
                    outputs=rng.normal(size=(n, 3)).astype(np.float32),
                    node_index=j)
        )
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        anim.rotation_channels.append(
            Channel(interpolation=interp, inputs=times, outputs=q,
                    node_index=j)
        )
        anim.scale_channels.append(
            Channel(interpolation=LINEAR, inputs=times,
                    outputs=rng.uniform(0.5, 2, (K, 3)).astype(np.float32),
                    node_index=j)
        )

    for t in [0.0, 0.5, 1.23456, 1.999, 2.0, 2.5, -0.1]:
        nat = AnimationJoints([sc.Similarity() for _ in range(J)])
        py = AnimationJoints([sc.Similarity() for _ in range(J)])
        anim.animate(nat, t)
        assert A._anim_sample_fn not in (None, False), "native must load"
        saved = A._anim_sample_fn
        A._anim_sample_fn = False
        try:
            anim.animate(py, t)
        finally:
            A._anim_sample_fn = saved
        for f in ("local_translation", "local_scale", "local_rotation"):
            a, b = getattr(nat, f), getattr(py, f)
            assert np.allclose(a, b, atol=2e-6), (t, f, np.abs(a - b).max())


def test_native_animate_rejects_malformed_channels():
    """Malformed channel meta (out-of-range node, wrong component count)
    must never reach the raw-pointer C++ sampler: the native path declines
    and the Python path raises its usual clean errors."""
    from superconductor_tpu.animation import (
        LINEAR,
        Animation,
        AnimationJoints,
        Channel,
    )

    times = np.linspace(0.0, 1.0, 4).astype(np.float32)

    # node index far past the joint array
    anim = Animation(total_time=1.0)
    anim.translation_channels.append(
        Channel(interpolation=LINEAR, inputs=times,
                outputs=np.zeros((4, 3), np.float32), node_index=100000)
    )
    joints = AnimationJoints([sc.Similarity() for _ in range(5)])
    with pytest.raises(IndexError):
        anim.animate(joints, 0.5)

    # wrong component count (MAT4-sized outputs on a translation channel)
    anim2 = Animation(total_time=1.0)
    anim2.translation_channels.append(
        Channel(interpolation=LINEAR, inputs=times,
                outputs=np.zeros((4, 16), np.float32), node_index=0)
    )
    assert anim2._packed_channels() is None  # invalid: native path declines
    with pytest.raises(ValueError):
        anim2.animate(AnimationJoints([sc.Similarity()]), 0.5)

    # outputs shorter than the keyframe count
    anim3 = Animation(total_time=1.0)
    anim3.translation_channels.append(
        Channel(interpolation=LINEAR, inputs=times,
                outputs=np.zeros((2, 3), np.float32), node_index=0)
    )
    assert anim3._packed_channels() is None


def test_single_keyframe_channel_holds_value():
    """A K=1 channel sampled exactly at its key time must hold the key's
    value on both paths (the old Python path produced NaN for LINEAR; the
    old native path read before the array)."""
    import superconductor_tpu.animation as A
    from superconductor_tpu.animation import (
        LINEAR,
        Animation,
        AnimationJoints,
        Channel,
    )

    anim = Animation(total_time=0.0)
    anim.translation_channels.append(
        Channel(interpolation=LINEAR, inputs=np.zeros(1, np.float32),
                outputs=np.array([[1.5, 2.5, -3.0]], np.float32),
                node_index=0)
    )
    for force_python in (False, True):
        joints = AnimationJoints([sc.Similarity()])
        saved = A._anim_sample_fn
        if force_python:
            A._anim_sample_fn = False
        try:
            anim.animate(joints, 0.0)
        finally:
            A._anim_sample_fn = saved
        assert np.allclose(
            joints.local_translation[0], [1.5, 2.5, -3.0]
        ), force_python
