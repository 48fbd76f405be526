"""CPU frustum culling: bounding spheres now, SAT OBB refinement included.

Vectorized ports of renderer-core/src/culling.rs:
  * ``sphere_culling_params`` / ``test_bounding_spheres``: frustum planes
    extracted from the view-projection matrix (Gribb-Hartmann, the
    niagara-style construction in culling.rs:345-359) and tested against
    many spheres at once — the reference tests one primitive at a time in
    a hot loop; we do the whole scene as one numpy expression.
  * ``test_obbs_sat``: separating-axis OBB vs frustum test
    (culling.rs:75-334), optional per-primitive refinement.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..math3d import quat_to_mat3


@dataclass
class BoundingSphereParams:
    planes: np.ndarray  # (P, 4) world-space planes, normal . x + d >= 0 inside


def sphere_culling_params(view_proj: np.ndarray, infinite_far: bool = True):
    """Extract frustum planes from a view-projection matrix (row-major,
    clip = M @ [x,1]; wgpu z in [0, 1])."""
    m = np.asarray(view_proj, np.float64)
    rows = []
    rows.append(m[3] + m[0])  # left:   x >= -w
    rows.append(m[3] - m[0])  # right:  x <= w
    rows.append(m[3] + m[1])  # bottom
    rows.append(m[3] - m[1])  # top
    rows.append(m[2])  # near for z >= 0 convention (covers reverse-z too)
    if not infinite_far:
        rows.append(m[3] - m[2])
    planes = np.stack(rows)
    n = np.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    planes = planes / np.where(n == 0, 1.0, n)
    return BoundingSphereParams(planes=planes.astype(np.float32))


def test_bounding_spheres(
    centers: np.ndarray, radii: np.ndarray, params: BoundingSphereParams
) -> np.ndarray:
    """(N,) bool visibility for N spheres (world space)."""
    d = centers @ params.planes[:, :3].T + params.planes[None, :, 3]
    return np.all(d >= -radii[:, None], axis=1)


def test_obbs_sat(
    bbox_min: np.ndarray,  # (N, 3) model-space boxes
    bbox_max: np.ndarray,
    sim8: np.ndarray,  # (N, 8) world transforms
    params: BoundingSphereParams,
) -> np.ndarray:
    """Conservative OBB-vs-frustum: project the 8 transformed corners of
    each box onto every frustum plane (a cheaper but still exact-for-planes
    variant of the reference's SAT test — it omits the cross-axis tests of
    culling.rs:75-334 which only remove a sliver of false positives)."""
    n = len(bbox_min)
    if n == 0:
        return np.zeros(0, bool)
    corners = np.stack(
        [
            np.where(
                np.array([(i >> k) & 1 for k in range(3)], bool), bbox_max[j], bbox_min[j]
            )
            for j in range(n)
            for i in range(8)
        ]
    ).reshape(n, 8, 3)
    rot = quat_to_mat3(sim8[:, 4:8])  # (N, 3, 3)
    world = (
        sim8[:, None, 0:3]
        + sim8[:, None, 3:4] * np.einsum("nij,nkj->nki", rot, corners)
    )
    d = (
        np.einsum("nkc,pc->nkp", world, params.planes[:, :3])
        + params.planes[None, None, :, 3]
    )
    # Box visible iff no plane has all 8 corners outside.
    return ~np.any(np.all(d < 0, axis=1), axis=1)
