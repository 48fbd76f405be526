"""Stereo multiview helpers: dual-eye rendering + side-by-side composite.

The reference renders both eyes in one multiview draw (2-layer array
framebuffer selected by view_index, rendering.rs:209-441) and composites
them side-by-side with the tonemap shader (shaders/src/lib.rs:643-669).
Here views are a leading batch axis of the frame function (num_views=2)
and the composite is an array reshape; on a multi-chip mesh each eye can
own a device group (parallel/bands.py).
"""

from __future__ import annotations

import numpy as np

from ..math3d import (
    perspective_reversed_z_infinite,
    perspective_z01,
    view_from_camera,
)
from .camera import Camera, Uniforms, make_stereo_uniforms


def stereo_uniforms_from_camera(
    camera: Camera,
    width: int,
    height: int,
    ipd: float = 0.064,
    fov_y: float = np.pi / 3,
    z_near: float = 0.05,
    reverse_z: bool = True,
    z_far: float | None = None,
) -> Uniforms:
    """Two eye views offset by half the interpupillary distance along the
    camera's local x axis (a simple HMD model; WebXR would hand us poses
    per eye, update_webxr_uniform_buffers, src/systems.rs:871-989)."""
    from ..math3d import quat_rotate

    right_axis = quat_rotate(camera.rotation, np.array([1.0, 0, 0], np.float32))
    half = 0.5 * ipd * right_axis
    left_eye = camera.position - half
    right_eye = camera.position + half
    # per-eye aspect: each eye renders width x height
    if reverse_z:
        proj = perspective_reversed_z_infinite(fov_y, width / height, z_near)
    else:
        proj = perspective_z01(fov_y, width / height, z_near, z_far or 1000.0)
    lv = view_from_camera(left_eye, camera.rotation)
    rv = view_from_camera(right_eye, camera.rotation)
    return make_stereo_uniforms(
        lv, rv, proj, proj, left_eye, right_eye, camera.rotation, camera.rotation
    )


def composite_side_by_side(frames) -> np.ndarray:
    """(2, H, W, 4) -> (H, 2W, 4): left eye left, right eye right — the
    arrangement the reference's stereo tonemap pass samples (uv.x <> 0.5)."""
    frames = np.asarray(frames)
    assert frames.shape[0] == 2
    return np.concatenate([frames[0], frames[1]], axis=1)
