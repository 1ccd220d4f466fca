"""BVH parser/writer round-trip tests."""

import numpy as np

from amuse_tpu.data import bvh as B

SAMPLE = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 5.0 0.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.03333333
1.0 2.0 3.0 0.0 0.0 0.0 90.0 0.0 0.0
1.5 2.5 3.5 0.0 90.0 0.0 0.0 0.0 45.0
"""


def test_parse_hierarchy(tmp_path):
    p = tmp_path / "a.bvh"
    p.write_text(SAMPLE)
    data = B.parse_bvh(p)
    names = [j.name for j in data.joints if not j.is_end_site]
    assert names == ["Hips", "Spine"]
    assert data.num_frames == 2
    assert abs(data.fps - 30.0) < 0.01
    assert data.joints[1].parent == 0
    np.testing.assert_allclose(data.joints[1].offset, [0, 10, 0])
    assert data.joints[0].channels[:3] == ["Xposition", "Yposition", "Zposition"]


def test_to_axis_angle(tmp_path):
    p = tmp_path / "a.bvh"
    p.write_text(SAMPLE)
    data = B.parse_bvh(p)
    poses, trans, names = B.bvh_to_axis_angle(data)
    assert poses.shape == (2, 2, 3)
    assert names == ["Hips", "Spine"]
    np.testing.assert_allclose(trans[0], [1.0, 2.0, 3.0])
    # frame 0: Spine rotated 90 deg about Z -> axis-angle (0, 0, pi/2)
    np.testing.assert_allclose(poses[0, 1], [0, 0, np.pi / 2], atol=1e-5)
    # frame 1: Hips rotated 90 deg about X (X is second channel in ZXY order)
    np.testing.assert_allclose(poses[1, 0], [np.pi / 2, 0, 0], atol=1e-5)


def test_write_round_trip(tmp_path):
    p = tmp_path / "a.bvh"
    p.write_text(SAMPLE)
    data = B.parse_bvh(p)
    out = B.write_bvh(tmp_path / "b.bvh", data)
    data2 = B.parse_bvh(out)
    assert [j.name for j in data2.joints] == [j.name for j in data.joints]
    np.testing.assert_allclose(data2.frames, data.frames, atol=1e-5)
    assert abs(data2.frame_time - data.frame_time) < 1e-8


def test_euler_order_zxy_matches_composition():
    # R = Rz @ Rx @ Ry for channel order Zrotation Xrotation Yrotation
    ang = np.asarray([[30.0, 40.0, 50.0]])
    m = B._euler_to_matrix(ang, "ZXY")[0]

    def rot(axis, deg):
        r = np.deg2rad(deg)
        c, s = np.cos(r), np.sin(r)
        if axis == "X":
            return np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == "Y":
            return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rot("Z", 30) @ rot("X", 40) @ rot("Y", 50)
    np.testing.assert_allclose(m, expected, atol=1e-12)
