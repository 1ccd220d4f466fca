"""Blender addon bootstrap + GT/baseline render tasks (the round-2 verdict's
row-18 tail). No Blender ships in CI, so the orchestration is exercised two
ways: gated no-Blender behaviour (npz products still written, actionable
messages) and a fake ``blender`` executable that emulates the probe/install/
enable protocol of viz/blender/setup_addons.py."""

import json
import os
import stat
import tarfile
import zipfile
from pathlib import Path

import numpy as np
import pytest

from amuse_tpu.viz import blender_setup as bs

FAKE_BLENDER = r'''#!/usr/bin/env python
import json, os, sys
args = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
state_path = os.environ["FAKE_BLENDER_STATE"]
state = json.load(open(state_path)) if os.path.exists(state_path) else {
    "modules": [], "enabled": []}
action, rest = args[0], args[1:]
if action == "probe":
    print("BLPROBE:" + json.dumps({"version": "3.6.0-fake",
                                   "modules": state["modules"],
                                   "enabled": state["enabled"]}))
elif action == "install":
    import zipfile
    for z in rest:
        top = zipfile.ZipFile(z).namelist()[0].split("/")[0]
        if top not in state["modules"]:
            state["modules"].append(top)
        print("BLSETUP: installed", z)
elif action == "enable":
    for m in rest:
        if m in state["modules"] and m not in state["enabled"]:
            state["enabled"].append(m)
            print("BLSETUP: enabled", m)
        elif m not in state["modules"]:
            print("BLSETUP: enable FAILED", m)
json.dump(state, open(state_path, "w"))
'''


@pytest.fixture
def fake_blender(tmp_path, monkeypatch):
    exe = tmp_path / "bin" / "blender"
    exe.parent.mkdir()
    exe.write_text(FAKE_BLENDER)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{exe.parent}:{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_BLENDER_STATE", str(tmp_path / "state.json"))
    return exe


def _make_addon_tar(path: Path, module: str):
    src = path.parent / "src" / module
    src.mkdir(parents=True)
    (src / "__init__.py").write_text("bl_info = {}\n")
    with tarfile.open(path, "w:xz") as tf:
        tf.add(src, arcname=module)


class TestNoBlender:
    def test_setup_reports_actionably(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
        rep = bs.setup(tmp_path)
        assert not rep.ok
        assert any("not found on PATH" in e for e in rep.errors)

    def test_probe_none(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PATH", str(tmp_path))
        assert bs.probe() is None


class TestFakeBlenderProtocol:
    def test_full_setup_installs_and_enables(self, fake_blender, tmp_path):
        addons = tmp_path / "addons"
        addons.mkdir()
        _make_addon_tar(addons / "retarget_bvh.tar.xz", "retarget_bvh")
        with zipfile.ZipFile(addons / "smplx_blender_addon_300.zip", "w") as zf:
            zf.writestr("smplx_blender_addon/__init__.py", "bl_info = {}\n")

        rep = bs.setup(addons)
        assert rep.version == "3.6.0-fake"
        assert set(rep.installed) == {"retarget_bvh", "smplx_blender_addon"}
        assert set(rep.enabled) == {"retarget_bvh", "smplx_blender_addon"}
        # the licensed/unprovided ones are reported with guidance, not errors
        assert "auto_rig_pro-master" in rep.missing
        assert "blendermarket" in rep.missing["auto_rig_pro-master"]
        assert not rep.ok  # missing addons -> not fully ready

    def test_second_run_is_idempotent(self, fake_blender, tmp_path):
        addons = tmp_path / "addons"
        addons.mkdir()
        _make_addon_tar(addons / "retarget_bvh.tar.xz", "retarget_bvh")
        bs.setup(addons)
        rep2 = bs.setup(addons)
        assert rep2.installed == []  # already present -> no reinstall
        assert "retarget_bvh" in rep2.enabled


class TestTarToZip:
    def test_tar_xz_round_trip(self, tmp_path):
        _make_addon_tar(tmp_path / "import_runtime_mhx2.tar.xz", "import_runtime_mhx2")
        z = bs._as_installable_zip(tmp_path / "import_runtime_mhx2.tar.xz", tmp_path)
        names = zipfile.ZipFile(z).namelist()
        assert all(n.startswith("import_runtime_mhx2/") for n in names)
        assert "import_runtime_mhx2/__init__.py" in names

    def test_zip_passthrough(self, tmp_path):
        p = tmp_path / "a.zip"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("a/__init__.py", "")
        assert bs._as_installable_zip(p, tmp_path) == p


class TestRenderTasks:
    @pytest.fixture
    def tree(self, tmp_path):
        from amuse_tpu.cli.config import load_config

        rng = np.random.default_rng(0)
        mosh = tmp_path / "mosh"
        mosh.mkdir()
        np.savez(mosh / "2_scott_0_9_9.npz",
                 poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                 trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        base = tmp_path / "baselines" / "camn"
        base.mkdir(parents=True)
        np.savez(base / "2_scott_0_9_9.npz",
                 poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                 trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        return load_config(None, {
            "data": {"mosh_root": str(mosh), "data_root": str(tmp_path / "beat"),
                     "baselines_root": str(tmp_path / "baselines"),
                     "window_frames": 30},
            "out_dir": str(tmp_path / "runs"), "debug": True,
        })

    def test_render_gt_writes_window_npz_without_blender(self, tree, monkeypatch, tmp_path):
        from amuse_tpu.cli import main as cli

        monkeypatch.setenv("PATH", str(tmp_path))  # no blender, no ffmpeg
        cli.task_render_gt(tree)
        outs = sorted((Path(tree.out_dir)).glob("*/GT/2_scott_0_9_9/seq_*/*.npz"))
        assert len(outs) == 2  # 60 frames / 30-frame windows
        d = np.load(outs[0])
        assert d["poses"].shape == (30, 55, 3)
        assert str(d["gender"]) == "male"

    def test_render_baselines_writes_method_npz(self, tree, monkeypatch, tmp_path):
        from amuse_tpu.cli import main as cli

        monkeypatch.setenv("PATH", str(tmp_path))
        cli.task_render_baselines(tree)
        outs = sorted(Path(tree.out_dir).glob("*/camn/2_scott_0_9_9/seq_*/*.npz"))
        assert len(outs) == 2


class TestReviewRegressions:
    """Round-3 review findings: misaligned bake weights, wedged-Blender
    timeout, per-method GT re-render, silently-skipped embedder path."""

    def _run_bake_face(self, tmp_path, weights):
        """Exec viz/blender/bake_face.py with a stub bpy; return the
        per-shape-key keyframed value traces."""
        import sys
        import types

        class Block:
            def __init__(self, name):
                self.name, self.value, self.keys = name, 0.0, {}

            def keyframe_insert(self, _prop, frame):
                self.keys[frame] = self.value

        blocks = [Block(n) for n in ("Basis", "Exp000", "Exp001", "Exp002")]
        shape_keys = types.SimpleNamespace(key_blocks=blocks, animation_data=None)
        mesh_obj = types.SimpleNamespace(
            type="MESH", data=types.SimpleNamespace(shape_keys=shape_keys))
        scene = types.SimpleNamespace(
            render=types.SimpleNamespace(fps=24), frame_end=1)
        bpy = types.SimpleNamespace(
            data=types.SimpleNamespace(
                objects=types.SimpleNamespace(get=lambda n: mesh_obj)),
            context=types.SimpleNamespace(scene=scene),
        )
        wpath = tmp_path / "weights.json"
        wpath.write_text(json.dumps(weights))
        src = (Path(__file__).parent.parent
               / "amuse_tpu/viz/blender/bake_face.py").read_text()
        old_argv, old_bpy = sys.argv, sys.modules.get("bpy")
        sys.argv = ["blender", "--", "bake", "Face", str(wpath)]
        sys.modules["bpy"] = bpy
        try:
            exec(compile(src, "bake_face.py", "exec"), {"__name__": "__main__"})
        finally:
            sys.argv = old_argv
            if old_bpy is None:
                sys.modules.pop("bpy", None)
            else:
                sys.modules["bpy"] = old_bpy
        return {b.name: b.keys for b in blocks}

    def test_bake_face_missing_name_keeps_columns_aligned(self, tmp_path):
        # Exp001 is in the weights but NOT on the mesh -> its column must be
        # skipped, not shifted onto Exp002 (the round-3 review finding).
        keys = self._run_bake_face(tmp_path, {
            "names": ["Exp000", "ExpMISSING", "Exp002"],
            "frames": [[0.1, 0.5, 0.9], [0.2, 0.6, 1.0]],
        })
        assert keys["Exp000"] == {1: pytest.approx(0.1), 2: pytest.approx(0.2)}
        assert keys["Exp002"] == {1: pytest.approx(0.9), 2: pytest.approx(1.0)}
        assert keys["Exp001"] == {}  # never keyed

    def test_run_blender_timeout_is_reported_not_raised(self, tmp_path, monkeypatch):
        exe = tmp_path / "blender"
        exe.write_text("#!/bin/sh\nsleep 5\n")
        exe.chmod(0o755)
        monkeypatch.setattr(bs.subprocess, "run",
                            lambda *a, **k: (_ for _ in ()).throw(
                                bs.subprocess.TimeoutExpired(a[0], 600)))
        rc = bs._run_blender(str(exe), ["probe"])
        assert rc.returncode == 124
        assert "timed out" in rc.stderr

    def test_render_baselines_renders_gt_once_per_take(self, tmp_path, monkeypatch):
        from amuse_tpu.cli import main as cli
        from amuse_tpu.cli.config import load_config
        from amuse_tpu.viz import export

        rng = np.random.default_rng(0)
        mosh = tmp_path / "mosh"
        mosh.mkdir()
        np.savez(mosh / "2_scott_0_9_9.npz",
                 poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                 trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        for method in ("camn", "mdm", "trimodal"):
            d = tmp_path / "baselines" / method
            d.mkdir(parents=True)
            np.savez(d / "2_scott_0_9_9.npz",
                     poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                     trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        cfg = load_config(None, {
            "data": {"mosh_root": str(mosh), "data_root": str(tmp_path / "beat"),
                     "baselines_root": str(tmp_path / "baselines"),
                     "window_frames": 30},
            "out_dir": str(tmp_path / "runs"), "debug": True,
        })
        calls = []
        monkeypatch.setattr(export, "render_windows",
                            lambda paths, wav_path=None, **viz: calls.append(
                                tuple(str(p) for p in paths)) or [])
        cli.task_render_baselines(cfg)
        gt_calls = [c for c in calls if any("/GT/" in p for p in c)]
        assert len(gt_calls) == 1  # 3 methods, same take -> GT rendered once

    def test_render_baselines_slices_gt_only_for_covered_takes(
        self, tmp_path, monkeypatch
    ):
        # round-3 review finding: a 100-take mosh_root vs a 2-take baseline
        # must not slice (and write) GT windows for the other 98 takes.
        from amuse_tpu.cli import main as cli
        from amuse_tpu.cli.config import load_config

        rng = np.random.default_rng(0)
        mosh = tmp_path / "mosh"
        mosh.mkdir()
        for stem in ("2_scott_0_9_9", "2_scott_0_10_10", "9_miranda_0_9_9"):
            np.savez(mosh / f"{stem}.npz",
                     poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                     trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        d = tmp_path / "baselines" / "camn"
        d.mkdir(parents=True)
        np.savez(d / "2_scott_0_9_9.npz",  # baseline covers ONE take
                 poses=(0.2 * rng.normal(size=(60, 165))).astype(np.float32),
                 trans=(0.1 * rng.normal(size=(60, 3))).astype(np.float32))
        cfg = load_config(None, {
            "data": {"mosh_root": str(mosh), "data_root": str(tmp_path / "beat"),
                     "baselines_root": str(tmp_path / "baselines"),
                     "window_frames": 30},
            "out_dir": str(tmp_path / "runs"), "debug": True,
        })
        monkeypatch.setenv("PATH", str(tmp_path))  # no blender/ffmpeg
        cli.task_render_baselines(cfg)
        gt = sorted(Path(cfg.out_dir).glob("*/GT/*/"))
        assert [p.name for p in gt] == ["2_scott_0_9_9"]

    def test_eval_gesture_explicit_missing_embedder_is_fatal(self, tmp_path):
        from amuse_tpu.cli import main as cli
        from amuse_tpu.cli.config import load_config

        cfg = load_config(None, {
            "data": {"embedder_path": str(tmp_path / "nope.npz"),
                     "cache_dir": str(tmp_path / "cache"),
                     "smplx_model_dir": str(tmp_path)},
            "out_dir": str(tmp_path / "runs"), "debug": True,
        })
        with pytest.raises(SystemExit, match="embedder_path"):
            cli.task_eval_gesture(cfg)
