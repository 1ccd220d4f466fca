"""PyMO-equivalent featurisation pipelines (bvh_utils.py:1672-1745)."""

import numpy as np

from amuse_tpu.data import bvh as B
from amuse_tpu.data.pymo_pipeline import (
    PymoOptions,
    PymoPipeline,
    feats_to_joints,
    options_for_version,
)


def _make_bvh(frames=16, fps=60.0, seed=0):
    """2-joint walking skeleton with a curving root path."""
    rng = np.random.default_rng(seed)
    joints = [
        B.BvhJoint(
            "Hips", -1, np.zeros(3),
            ["Xposition", "Yposition", "Zposition",
             "Zrotation", "Xrotation", "Yrotation"],
        ),
        B.BvhJoint("Spine", 0, np.array([0.0, 10.0, 0.0]),
                   ["Zrotation", "Xrotation", "Yrotation"]),
        B.BvhJoint("Spine_end", 1, np.array([0.0, 5.0, 0.0]), [], True),
    ]
    t = np.arange(frames)
    data = np.zeros((frames, 9))
    data[:, 0] = 3.0 * t  # X walk
    data[:, 1] = 95.0 + np.sin(t / 3.0)  # bobbing height
    data[:, 2] = 0.5 * t  # Z drift
    data[:, 5] = 4.0 * t  # slow yaw turn (Yrotation)
    data[:, 3] = 5.0 * np.sin(t / 2.0)  # root roll (Zrotation)
    data[:, 6:9] = rng.normal(scale=20.0, size=(frames, 3))  # spine euler
    return B.BvhData(joints=joints, frames=data, frame_time=1.0 / fps)


class TestVersions:
    def test_tag_mapping(self):
        v0 = options_for_version("pymo_dB_v0_fing")
        assert v0.root_transform == "pos_rot_deltas" and v0.position_smoothing == 5
        v1 = options_for_version("pymo_dB_v1_fing")
        assert v1.root_transform == "none"
        v2 = options_for_version("pymo_dB_v2_fing")
        assert v2.root_transform == "pos_rot_deltas" and v2.position_smoothing == 0
        assert options_for_version("pymo_dB_v3_fing").keep_root_trans

    def test_suffixless_tags_resolve_identically(self):
        """'pymo_dB_v1' (no _fing) must not silently fall through to v2."""
        for tag in ("v0", "v1", "v2", "v3", "v4", "v5"):
            assert options_for_version(f"pymo_dB_{tag}") == options_for_version(
                f"pymo_dB_{tag}_fing"
            ), tag


class TestPipeline:
    def test_downsample_stride(self):
        bvh = _make_bvh(frames=16, fps=60.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30, root_transform="none"))
        feats = pipe.fit_transform(bvh)
        assert feats.shape == (8, 3 + 3 + 3)  # pos + root expmap + spine expmap

    def test_roundtrip_no_root_transform(self):
        bvh = _make_bvh(fps=30.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30, root_transform="none"))
        feats = pipe.fit_transform(bvh)
        back = pipe.inverse(feats)
        # exact round-trip: positions and joint rotations survive
        from amuse_tpu.data.motion_features import forward_kinematics

        np.testing.assert_allclose(
            forward_kinematics(back), forward_kinematics(bvh), atol=1e-6
        )

    def test_roundtrip_pos_rot_deltas_is_start_relative(self):
        """Deltas integrate from origin/zero-yaw: the reconstruction equals
        the original up to the start frame's rigid (XZ + yaw) placement."""
        bvh = _make_bvh(fps=30.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30))
        feats = pipe.fit_transform(bvh)
        back = pipe.inverse(feats)
        from amuse_tpu.data.motion_features import forward_kinematics

        pa = forward_kinematics(bvh)
        pb = forward_kinematics(back)
        # heights are absolute
        np.testing.assert_allclose(pb[..., 1], pa[..., 1], atol=1e-5)
        # rigid invariants: pairwise distances between root positions across
        # time and within-frame joint distances are preserved
        da = np.linalg.norm(np.diff(pa[:, 0], axis=0), axis=-1)
        db = np.linalg.norm(np.diff(pb[:, 0], axis=0), axis=-1)
        np.testing.assert_allclose(db, da, atol=1e-5)
        ja = np.linalg.norm(pa[:, 1] - pa[:, 0], axis=-1)
        jb = np.linalg.norm(pb[:, 1] - pb[:, 0], axis=-1)
        np.testing.assert_allclose(jb, ja, atol=1e-5)

    def test_keep_root_trans_reproduces_absolute_track(self):
        bvh = _make_bvh(fps=30.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30, keep_root_trans=True))
        back = pipe.inverse(pipe.fit_transform(bvh))
        np.testing.assert_allclose(back.frames[:, 0], bvh.frames[:, 0], atol=1e-5)
        np.testing.assert_allclose(back.frames[:, 2], bvh.frames[:, 2], atol=1e-5)

    def test_yaw_smoothing_across_branch_cut(self):
        """Yaw hovering around +-pi (facing away from +Z): smoothing must
        average the UNWRAPPED angle - wrapped averaging of 3.1 and -3.1
        collapses toward 0 and makes dyaw spike by ~2 rad/frame."""
        bvh = _make_bvh(fps=30.0)
        # Yrotation oscillating tightly around 180 degrees
        bvh.frames[:, 5] = 180.0 + 2.0 * np.sin(np.arange(16))
        feats = PymoPipeline(
            PymoOptions(tgt_fps=30, rotation_smoothing=3)
        ).fit_transform(bvh)
        dyaw = feats[:, 3]
        assert np.max(np.abs(dyaw)) < 0.2, dyaw  # no 2-rad spikes

    def test_smoothing_reduces_jitter(self):
        bvh = _make_bvh(fps=30.0, seed=1)
        bvh.frames[:, 0] += np.random.default_rng(2).normal(scale=2.0, size=16)
        raw = PymoPipeline(PymoOptions(tgt_fps=30)).fit_transform(bvh)
        smooth = PymoPipeline(
            PymoOptions(tgt_fps=30, position_smoothing=5)
        ).fit_transform(bvh)
        assert np.var(smooth[:, 0]) < np.var(raw[:, 0])

    def test_feats_to_joints_shape(self):
        bvh = _make_bvh(fps=30.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30))
        joints = feats_to_joints(pipe, pipe.fit_transform(bvh))
        assert joints.shape == (16, 3, 3)  # incl. end site

    def test_joint_selection_includes_root(self):
        bvh = _make_bvh(fps=30.0)
        pipe = PymoPipeline(PymoOptions(tgt_fps=30, joints=("Spine",)))
        feats = pipe.fit_transform(bvh)
        assert pipe.joint_names[0] == "Hips"  # root forced in
        assert feats.shape[1] == 4 + 3 + 3
