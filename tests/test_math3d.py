import numpy as np
import pytest

from superconductor_tpu.math3d import (
    Similarity,
    look_at,
    mat4_inverse,
    perspective_reversed_z_infinite,
    quat_from_axis_angle,
    quat_mul,
    quat_rotate,
    quat_to_mat3,
    similarity_apply,
    similarity_compose8,
    view_from_camera,
)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        angle = rng.uniform(-np.pi, np.pi)
        q = quat_from_axis_angle(axis, angle)
        v = rng.normal(size=3).astype(np.float32)
        np.testing.assert_allclose(
            quat_rotate(q, v), quat_to_mat3(q) @ v, rtol=1e-5, atol=1e-5
        )


def test_quat_mul_composes():
    q1 = quat_from_axis_angle([0, 0, 1], 0.7)
    q2 = quat_from_axis_angle([0, 1, 0], -1.1)
    v = np.array([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(
        quat_rotate(quat_mul(q1, q2), v),
        quat_rotate(q1, quat_rotate(q2, v)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_similarity_compose_and_inverse():
    a = Similarity([1, 2, 3], 2.0, quat_from_axis_angle([1, 1, 0], 0.5))
    b = Similarity([-4, 0, 1], 0.5, quat_from_axis_angle([0, 1, 1], -0.3))
    p = np.array([0.3, -0.7, 2.0], np.float32)
    np.testing.assert_allclose(
        (a * b).apply_point(p), a.apply_point(b.apply_point(p)), rtol=1e-5, atol=1e-5
    )
    ident = a * a.inverse()
    np.testing.assert_allclose(ident.apply_point(p), p, rtol=1e-4, atol=1e-4)


def test_similarity_packed_matches_class():
    a = Similarity([1, -2, 0.5], 1.7, quat_from_axis_angle([0.2, 1, -1], 0.9))
    b = Similarity([0, 3, -1], 0.25, quat_from_axis_angle([1, 0, 0], -1.4))
    p = np.array([[0.1, 0.2, 0.3], [5, -6, 7]], np.float32)
    np.testing.assert_allclose(
        similarity_apply(a.to_array(), p),
        np.stack([a.apply_point(pi) for pi in p]),
        rtol=1e-5,
        atol=1e-5,
    )
    ab8 = similarity_compose8(a.to_array()[None], b.to_array()[None])[0]
    np.testing.assert_allclose(
        ab8, (a * b).to_array(), rtol=1e-5, atol=1e-5
    )


def test_similarity_from_mat4_roundtrip():
    s = Similarity([3, 1, -2], 1.5, quat_from_axis_angle([1, 2, 3], 0.8))
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = quat_to_mat3(s.rotation) * s.scale
    m[:3, 3] = s.translation
    s2 = Similarity.from_mat4(m)
    p = np.array([0.4, 0.5, 0.6], np.float32)
    np.testing.assert_allclose(s2.apply_point(p), s.apply_point(p), rtol=1e-4, atol=1e-4)


def test_reverse_z_projection():
    proj = perspective_reversed_z_infinite(np.pi / 2, 1.0, 0.1)
    # near plane -> depth 1
    near = proj @ np.array([0, 0, -0.1, 1], np.float32)
    assert near[2] / near[3] == pytest.approx(1.0, abs=1e-6)
    # far away -> depth ~ 0
    far = proj @ np.array([0, 0, -1e6, 1], np.float32)
    assert far[2] / far[3] == pytest.approx(0.0, abs=1e-5)


def test_view_from_camera_matches_look_at():
    eye = np.array([1.0, 2.0, 3.0])
    view = look_at(eye, [0, 0, 0])
    # reconstruct camera rotation from the view matrix and compare
    inv = mat4_inverse(view)
    from superconductor_tpu.math3d import mat3_to_quat

    q = mat3_to_quat(inv[:3, :3])
    view2 = view_from_camera(eye, q)
    np.testing.assert_allclose(view, view2, rtol=1e-4, atol=1e-5)
