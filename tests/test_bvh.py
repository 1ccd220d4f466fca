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


def _make_55joint_bvh(tmp_path, n_frames=3, angle_fn=None, root_pos=(10.0, 20.0, 30.0)):
    """Synthesize a retargeted-SMPL-X-style BVH: 55 joints in a chain, root
    with 6 channels (pos + ZXY rot), the rest 3 rotation channels."""
    # root named like the SMPL-X armature: looks_like_smplx_rig keys on it
    lines = ["HIERARCHY", "ROOT pelvis", "{", "  OFFSET 0 0 0",
             "  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation"]
    for i in range(1, 55):
        pad = "  " * i
        lines += [f"{pad}JOINT j{i}", f"{pad}{{", f"{pad}  OFFSET 0 1 0",
                  f"{pad}  CHANNELS 3 Zrotation Xrotation Yrotation"]
    pad = "  " * 55
    lines += [f"{pad}End Site", f"{pad}{{", f"{pad}  OFFSET 0 1 0", f"{pad}}}"]
    for i in range(54, -1, -1):
        lines.append("  " * i + "}")
    lines += ["MOTION", f"Frames: {n_frames}", "Frame Time: 0.033333"]
    for t in range(n_frames):
        row = list(root_pos)
        for j in range(55):
            z = angle_fn(j) if angle_fn else 0.0
            row += [z, 0.0, 0.0]  # Z-rotation only
        lines.append(" ".join(f"{v:.6f}" for v in row))
    p = tmp_path / "retargeted.bvh"
    p.write_text("\n".join(lines))
    return p


class TestBvh2Smplx:
    def test_reorder_map_is_a_permutation(self):
        order = B.BEAT55_BVH_TO_SMPLX_ORDER
        assert order.shape == (55,)
        assert sorted(order.tolist()) == list(range(55))

    def test_reorder_and_zeroing(self, tmp_path):
        # distinctive Z-rotation per source joint: slot j must carry the
        # angle of source joint ORDER[j]; slots 22-24 (jaw/eyes) are zeroed
        p = _make_55joint_bvh(tmp_path, angle_fn=lambda j: float(j))
        poses, trans, fps = B.retargeted_bvh_to_smplx(B.parse_bvh(p))
        assert poses.shape == (3, 55, 3)
        order = B.BEAT55_BVH_TO_SMPLX_ORDER
        for slot in range(55):
            src = order[slot]
            expected = 0.0 if src in B.ZEROED_SOURCE_JOINTS else np.deg2rad(src)
            # Z-rotation by theta -> axis-angle (0, 0, theta)
            np.testing.assert_allclose(poses[0, slot], [0, 0, expected],
                                       atol=1e-5, err_msg=f"slot {slot}")
        assert fps == 31.0  # ceil(1/0.033333)

    def test_root_recentred_to_metres(self, tmp_path):
        p = _make_55joint_bvh(tmp_path, root_pos=(10.0, 20.0, 30.0))
        _, trans, _ = B.retargeted_bvh_to_smplx(B.parse_bvh(p))
        expected = (np.array([10.0, 20.0, 30.0]) - B.SMPLX_REST_ROOT_OFFSET_CM) / 100
        np.testing.assert_allclose(trans[0], expected, atol=1e-6)

    def test_npz_export_layout_and_betas(self, tmp_path):
        p = _make_55joint_bvh(tmp_path)
        out = B.convert_retargeted_bvh_to_npz(p, tmp_path / "out.npz", subject="scott")
        d = np.load(out)
        assert set(d.files) == {"poses", "trans", "gender", "mocap_frame_rate", "betas"}
        assert d["poses"].shape == (3, 55, 3)
        assert str(d["gender"]) == "male"
        assert np.abs(d["betas"]).sum() > 1.0  # real MoSh betas, not zeros

    def test_rejects_unretargeted_skeleton(self, tmp_path):
        import pytest

        p = tmp_path / "beat.bvh"
        p.write_text(SAMPLE)  # 2-joint skeleton
        with pytest.raises(ValueError, match="retarget"):
            B.retargeted_bvh_to_smplx(B.parse_bvh(p))

    def test_cli_task_converts_already_retargeted(self, tmp_path):
        from amuse_tpu.cli import main as cli
        from amuse_tpu.cli.config import load_config

        d = tmp_path / "beat" / "2"
        d.mkdir(parents=True)
        src = _make_55joint_bvh(tmp_path)
        (d / "2_scott_0_9_9.bvh").write_text(src.read_text())
        cfg = load_config(None, {
            "data": {"data_root": str(tmp_path / "beat"),
                     "mosh_root": str(tmp_path / "mosh")},
            "debug": True, "out_dir": str(tmp_path / "runs"),
        })
        cli.task_bvh2smplx(cfg)
        out = tmp_path / "mosh" / "2_scott_0_9_9.npz"
        assert out.exists()
        assert str(np.load(out)["gender"]) == "male"
        # restartable: second run must SKIP the existing output (unchanged
        # mtime), not silently reconvert/clobber it
        mtime = out.stat().st_mtime_ns
        cli.task_bvh2smplx(cfg)
        assert out.stat().st_mtime_ns == mtime
