"""FK + motion feature pipeline tests."""

import numpy as np

from amuse_tpu.data import bvh as B
from amuse_tpu.data.motion_features import MotionFeaturePipeline, forward_kinematics

SAMPLE = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    JOINT Head
    {
      OFFSET 0.0 5.0 0.0
      CHANNELS 3 Zrotation Xrotation Yrotation
      End Site
      {
        OFFSET 0.0 2.0 0.0
      }
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
1.0 0.0 0.0 90.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0 0.0
"""


def test_fk_rest_pose_offsets(tmp_path):
    p = tmp_path / "a.bvh"
    p.write_text(SAMPLE)
    data = B.parse_bvh(p)
    pos = forward_kinematics(data)
    # frame 0: identity rotations -> cumulative offsets
    np.testing.assert_allclose(pos[0, 0], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(pos[0, 1], [0, 10, 0], atol=1e-9)
    np.testing.assert_allclose(pos[0, 2], [0, 15, 0], atol=1e-9)
    np.testing.assert_allclose(pos[0, 3], [0, 17, 0], atol=1e-9)  # end site


def test_fk_root_rotation_propagates(tmp_path):
    p = tmp_path / "a.bvh"
    p.write_text(SAMPLE)
    data = B.parse_bvh(p)
    pos = forward_kinematics(data)
    # frame 1: root rotated 90 deg about Z and translated +x:
    # Spine offset (0,10,0) maps to (-10,0,0) + root (1,0,0)
    np.testing.assert_allclose(pos[1, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pos[1, 1], [-9, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pos[1, 2], [-14, 0, 0], atol=1e-6)


def test_feature_pipeline_round_trip():
    rng = np.random.default_rng(0)
    joints = rng.normal(size=(50, 7, 3))
    pipe = MotionFeaturePipeline().fit(joints)
    feats = pipe.transform(joints)
    assert feats.shape == (50, 21)
    assert abs(feats.mean()) < 1e-5
    back = pipe.inverse(feats)
    np.testing.assert_allclose(back, joints, atol=1e-4)


def test_pipeline_save_load(tmp_path):
    rng = np.random.default_rng(1)
    joints = rng.normal(size=(20, 3, 3))
    pipe = MotionFeaturePipeline().fit(joints)
    pipe.save(tmp_path / "stats.npz")
    pipe2 = MotionFeaturePipeline.load(tmp_path / "stats.npz")
    np.testing.assert_allclose(
        pipe2.transform(joints), pipe.transform(joints), atol=1e-7
    )
