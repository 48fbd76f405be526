"""Fly-camera rig: smoothing, scripted input, waypoint look_at."""

import numpy as np

from superconductor_tpu.render.rig import FlyCameraRig, parse_camera_script


def test_rig_smooths_toward_target():
    rig = FlyCameraRig(position=(0, 0, 0), position_smoothness=1.0)
    rig.target_pos = np.array([10.0, 0.0, 0.0], np.float32)
    p1, _ = rig.update(1 / 60)
    assert 0 < p1[0] < 10.0  # partial step, not a snap
    for _ in range(600):
        p, _ = rig.update(1 / 60)
    assert abs(p[0] - 10.0) < 1e-2  # converges


def test_rig_wasd_moves_along_view():
    rig = FlyCameraRig(position=(0, 0, 0), yaw=0.0, pitch=0.0,
                       position_smoothness=0.0)
    for _ in range(60):
        rig.apply_keys({"w"}, dt=1 / 60)
        rig.update(1 / 60)
    # yaw 0 faces -z
    assert rig.pos[2] < -1.0 and abs(rig.pos[0]) < 1e-4

    rig2 = FlyCameraRig(position=(0, 0, 0), yaw=90.0, position_smoothness=0.0)
    for _ in range(60):
        rig2.apply_keys({"w"}, dt=1 / 60)
        rig2.update(1 / 60)
    assert rig2.pos[0] < -1.0  # yaw 90 faces -x


def test_rig_look_at_points_camera():
    rig = FlyCameraRig(position_smoothness=0.0, rotation_smoothness=0.0)
    rig.look_at((0, 0, 5), (0, 0, 0))
    pos, rot = rig.update(1.0)
    from superconductor_tpu.math3d import quat_rotate

    fwd = quat_rotate(rot, np.array([0, 0, -1], np.float32))
    assert np.allclose(fwd, [0, 0, -1], atol=1e-3)

    rig.look_at((5, 5, 0), (0, 0, 0))
    for _ in range(5):
        pos, rot = rig.update(1.0)
    fwd = quat_rotate(rot, np.array([0, 0, -1], np.float32))
    expect = -np.array([5, 5, 0.0]) / np.linalg.norm([5, 5, 0])
    assert np.allclose(fwd, expect, atol=1e-2), (fwd, expect)


def test_camera_script_parse():
    script = parse_camera_script(
        "0-2 w\n3 w+d mouse=1,0.5\n# comment\n\n4-5 mouse=-2,0\n"
    )
    assert script[0] == ({"w"}, (0.0, 0.0))
    assert script[3] == ({"w", "d"}, (1.0, 0.5))
    assert script[5] == (set(), (-2.0, 0.0))
    assert 6 not in script


def test_rig_yaw_wraps_shortest_arc():
    """atan2-derived yaw targets wrap at +-180; the smoother must take the
    short way across the seam, not whip ~360 deg the long way around."""
    rig = FlyCameraRig()
    rig.yaw = 175.0
    rig.target_yaw = -175.0  # 10 deg away across the seam
    rig.target_pitch = rig.pitch = 0.0
    rig.target_pos = rig.pos.copy()
    for _ in range(200):
        rig.update(1 / 60)
    # converged onto the target modulo 360 without passing through 0
    d = ((rig.yaw - rig.target_yaw + 180.0) % 360.0) - 180.0
    assert abs(d) < 1e-3
    # a single step never moves more than the 10-deg short arc
    rig.yaw = 175.0
    before = rig.yaw
    rig.update(1 / 60)
    assert abs(rig.yaw - before) < 10.0
