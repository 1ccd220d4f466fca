"""tools/parity_report.py metric gate (reference: infer_ldm.py:75-114 is the
flow the tool replays; the gate is this repo's addition)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

spec = importlib.util.spec_from_file_location(
    "parity_report", Path(__file__).parent.parent / "tools" / "parity_report.py"
)
pr = importlib.util.module_from_spec(spec)
sys.modules["parity_report"] = pr
spec.loader.exec_module(pr)


def _pair(rng, frames=12):
    poses = rng.normal(size=(frames, 55, 3)).astype(np.float32) * 0.2
    trans = rng.normal(size=(frames, 3)).astype(np.float32) * 0.1
    return poses, trans


class TestMetricDiff:
    def test_identical_passes(self):
        poses, trans = _pair(np.random.default_rng(0))
        rep = pr.metric_diff(poses, trans, poses.copy(), trans.copy(), tol=5e-3)
        assert rep["pass"] is True
        assert rep["pose_max_rad"] == 0.0

    def test_localized_divergence_fails_despite_small_mae(self):
        # round-3 review finding: one joint diverging for a few frames must
        # FAIL even though the error dilutes under tol in the frame average.
        poses, trans = _pair(np.random.default_rng(1), frames=300)
        rp = poses.copy()
        rp[5, 10, 0] += 0.5  # single-element 0.5 rad divergence
        rep = pr.metric_diff(poses, trans, rp, trans.copy(), tol=5e-3)
        assert rep["pose_mae_rad"] <= 5e-3  # diluted: the old gate passed
        assert rep["pose_max_rad"] >= 0.5 - 1e-6
        assert rep["pass"] is False

    def test_translation_max_gated_too(self):
        poses, trans = _pair(np.random.default_rng(2), frames=300)
        rt = trans.copy()
        rt[0, 2] += 0.1  # 10 cm on one frame
        rep = pr.metric_diff(poses, trans, poses.copy(), rt, tol=5e-3)
        assert rep["pass"] is False

    def test_reference_layout_flexible(self):
        # reference npzs may store poses flat (T, 165); reshape must accept it
        poses, trans = _pair(np.random.default_rng(3))
        rep = pr.metric_diff(
            poses, trans, poses.reshape(len(poses), -1), trans.copy(), tol=5e-3
        )
        assert rep["pass"] is True
