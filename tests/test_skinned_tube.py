"""Procedural skinned tube: palette math + end-to-end skinned rendering
(the animated_vertex joint-palette path, shaders/src/lib.rs:64-127, on
procgen content — used by the stereo+animated bench config)."""

import numpy as np

import superconductor_tpu as sc
from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.utils.procgen import (
    add_skinned_tube,
    default_ambient_sh,
    skinned_tube_mesh,
    wave_joint_palette,
)


def test_palette_identity_at_zero_amplitude():
    pal = wave_joint_palette(1.3, 6, amp=0.0)
    ident = np.zeros((6, 8), np.float32)
    ident[:, 3] = 1.0  # scale
    ident[:, 7] = 1.0  # quat w
    assert np.allclose(pal, ident, atol=1e-6)


def test_mesh_weights_partition_unity():
    pos, nrm, uv, ji, jw, idx = skinned_tube_mesh(8, 6, num_joints=4)
    assert np.allclose(jw.sum(1), 1.0)
    assert ji.max() == 3 and ji.min() == 0
    # ring at y=0 is fully bound to joint 0
    root = pos[:, 1] == 0.0
    assert np.all(jw[root, 0] == 1.0)


def _render(scene, model, pal, cfg, env, uni):
    state = build_frame_state(
        scene, [(model, sc.Similarity())], uni, joint_palettes={0: pal}
    )
    return np.asarray(
        sc.render_frame(scene.device_arrays(), state, cfg, env)
    )[0]


def test_skinned_tube_bends():
    scene = sc.Scene()
    model = add_skinned_tube(scene, segments=12, slices=8)
    cam = sc.Camera(position=np.array([0.0, 1.0, 4.0], np.float32))
    v = look_at(cam.position, [0, 1.0, 0])
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uni = sc.make_uniforms(cam, 128, 128)
    env = sc.EnvBindings(
        clear_color=(0.15, 0.15, 0.2), ambient_sh=default_ambient_sh()
    )
    cfg = sc.RenderConfig(
        width=128, height=128, raster="ref", t_cap=16, t_cap_anim=512
    )
    straight = _render(
        scene, model, wave_joint_palette(0.0, 8, amp=0.0), cfg, env, uni
    )
    bent = _render(
        scene, model, wave_joint_palette(0.9, 8, amp=0.5), cfg, env, uni
    )
    bg = np.array([int(0.15 * 255)] * 2)

    def coverage(img):
        return (np.abs(img[..., :3].astype(int) - 44).max(-1) > 12).mean()

    assert coverage(straight) > 0.02  # tube visible
    assert coverage(bent) > 0.02
    # deformation changes the silhouette
    assert (straight != bent).mean() > 0.01
