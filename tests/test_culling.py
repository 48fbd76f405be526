"""Culling tests: bounding spheres + exact SAT OBB vs frustum."""

import numpy as np

from superconductor_tpu.math3d import (
    Similarity,
    look_at,
    mat3_to_quat,
    mat4_inverse,
    perspective_reversed_z_infinite,
    quat_from_axis_angle,
)
from superconductor_tpu.render.culling import (
    CullingFrustum,
    sphere_culling_params,
    test_bounding_spheres as check_spheres,
    test_obbs_sat_exact as check_sat,
)


def _setup(fov=np.pi / 3, aspect=1.0):
    eye = np.array([0.0, 0.0, 5.0])
    view = look_at(eye, [0, 0, 0])
    proj = perspective_reversed_z_infinite(fov, aspect, 0.1)
    return view, proj @ view


def test_sphere_culling():
    view, vp = _setup()
    params = sphere_culling_params(vp)
    centers = np.array(
        [
            [0, 0, 0],     # in front: visible
            [0, 0, 20],    # behind camera
            [50, 0, 0],    # far right, outside
            [3.2, 0, 0],   # near the right edge: radius makes it visible
        ],
        np.float32,
    )
    radii = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
    vis = check_spheres(centers, radii, params)
    assert vis.tolist() == [True, False, False, True]


def test_sat_exact_culling():
    fov, aspect = np.pi / 3, 1.0
    view, _ = _setup(fov, aspect)
    frustum = CullingFrustum.new(fov, aspect, 0.1, 1000.0)

    boxes_min = np.array([[-1, -1, -1]] * 5, np.float32)
    boxes_max = np.array([[1, 1, 1]] * 5, np.float32)
    sims = np.stack(
        [
            Similarity().to_array(),  # at origin: visible
            Similarity(translation=[0, 0, 30]).to_array(),  # behind camera
            Similarity(translation=[30, 0, 0]).to_array(),  # right, out
            Similarity(translation=[4.2, 0, 0]).to_array(),  # clips right edge
            Similarity(
                translation=[6.0, 6.0, 0],
                rotation=quat_from_axis_angle([0, 0, 1], 0.78),
            ).to_array(),  # corner diagonal: SAT should cull (sphere wouldn't)
        ]
    )
    vis = check_sat(boxes_min, boxes_max, sims, view, frustum)
    assert vis.tolist()[:4] == [True, False, False, True]
    # the diagonal corner case: definitely outside the frustum
    assert not vis[4]


def test_sat_no_false_negatives_vs_spheres():
    """Everything SAT culls must also fail (or barely pass) the sphere
    test's conservative check — SAT visible => sphere visible."""
    rng = np.random.default_rng(3)
    fov, aspect = np.pi / 3, 16 / 9
    eye = np.array([1.0, 2.0, 8.0])
    view = look_at(eye, [0, 0, 0])
    proj = perspective_reversed_z_infinite(fov, aspect, 0.1)
    params = sphere_culling_params(proj @ view)
    frustum = CullingFrustum.new(fov, aspect, 0.1, 1000.0)

    n = 300
    mins = -rng.uniform(0.1, 2.0, (n, 3)).astype(np.float32)
    maxs = rng.uniform(0.1, 2.0, (n, 3)).astype(np.float32)
    sims = np.zeros((n, 8), np.float32)
    sims[:, :3] = rng.uniform(-20, 20, (n, 3))
    sims[:, 3] = rng.uniform(0.2, 2.0, n)
    q = rng.normal(size=(n, 4))
    sims[:, 4:] = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    sat = check_sat(mins, maxs, sims, view, frustum)
    centers = sims[:, :3] + sims[:, 3:4] * 0.5 * (mins + maxs)  # approx
    radii = sims[:, 3] * np.linalg.norm(maxs - mins, axis=1) * 0.5 * 1.5
    sph = check_spheres(centers, radii, params)
    # SAT-visible boxes must be sphere-visible (sphere is conservative).
    assert not np.any(sat & ~sph)
    # SAT must cull strictly more than spheres on this population.
    assert sat.sum() < sph.sum()


def test_build_frame_state_sat_culling(box_glb=None):
    """SAT refinement drops a box the sphere test keeps."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_box_glb

    from superconductor_tpu import Camera, Scene, Similarity, make_uniforms
    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.render.culling import (
        CullingFrustum,
        sphere_culling_params,
    )

    scene = Scene()
    model = load_model(scene, make_box_glb(), name="box")
    cam = Camera(position=np.array([0, 0, 5.0], np.float32))
    uniforms = make_uniforms(cam, 128, 128, fov_y=np.pi / 3)
    params = [sphere_culling_params(uniforms.view_proj[0])]
    frustum = CullingFrustum.new(np.pi / 3, 1.0, 0.05, 1000.0)
    # A thin sliver position: just outside the corner diagonally — the
    # bounding sphere clips the frustum but the OBB does not.
    corner = Similarity(
        translation=[3.6, 3.6, 0.0],
        rotation=quat_from_axis_angle([0, 0, 1], 0.785),
    )
    inside = Similarity()
    view = cam.view_matrix()

    state_sphere = build_frame_state(
        scene, [(model, corner), (model, inside)], uniforms, cull_params=params
    )
    state_sat = build_frame_state(
        scene,
        [(model, corner), (model, inside)],
        uniforms,
        cull_params=params,
        sat=(view, frustum),
    )
    n_sphere = int(np.asarray(state_sphere.draws_static.valid).sum())
    n_sat = int(np.asarray(state_sat.draws_static.valid).sum())
    assert n_sat <= n_sphere
    assert n_sat >= 1  # the inside box always survives
