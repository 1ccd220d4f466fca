"""Viz export / render orchestration + shipped config presets."""

from pathlib import Path

import numpy as np
import pytest

from amuse_tpu.cli.config import load_config
from amuse_tpu.viz import export as vx

CONFIGS = Path(__file__).parents[1] / "configs"


class TestXstackLayout:
    def test_2x2(self):
        assert vx.xstack_layout(4, 2) == "0_0|w0_0|0_h0|w0_h0"

    def test_4x2(self):
        got = vx.xstack_layout(8, 4)
        assert got.split("|")[:4] == ["0_0", "w0_0", "w0+w0_0", "w0+w0+w0_0"]
        assert got.split("|")[4] == "0_h0"


class TestRenderOrchestration:
    def test_render_windows_noop_without_blender(self, tmp_path, monkeypatch):
        # point PATH at an empty dir: no blender/ffmpeg -> graceful no-op
        monkeypatch.setenv("PATH", str(tmp_path))
        p = vx.write_smplx_npz(
            tmp_path / "seq_0" / "x.npz", np.zeros((4, 55, 3)), np.zeros((4, 3)),
            subject="scott",
        )
        assert vx.render_windows([p]) == []
        assert not vx.mux_audio("a.mp4", "a.wav", "out.mp4")
        assert not vx.concat_grid(["a.mp4", "b.mp4"], "grid.mp4")

    def test_render_script_shipped(self):
        assert vx.DEFAULT_RENDER_SCRIPT.exists()

    def test_render_windows_with_stub_binaries(self, tmp_path, monkeypatch):
        """Drive the orchestration sequence with stub blender/ffmpeg that
        record their argv and create the output file: each npz must get a
        render + a window-sliced audio mux, grids must get an xstack call."""
        bindir = tmp_path / "bin"
        bindir.mkdir()
        log = tmp_path / "calls.log"
        stub = (
            "#!/bin/sh\n"
            f'echo "$0 $@" >> {log}\n'
            # create the .mp4 output argument (shell builtins only - PATH
            # holds just the stubs). NOT simply the last argv: blender's
            # call ends with the fps ("30.0"), and a stray file of that
            # name would land in the pytest cwd.
            'out=""\n'
            'for a in "$@"; do case "$a" in *.mp4) out="$a";; esac; done\n'
            '[ -n "$out" ] && : > "$out"\n'
            "exit 0\n"
        )
        for name in ("blender", "ffmpeg"):
            p = bindir / name
            p.write_text(stub)
            p.chmod(0o755)
        monkeypatch.setenv("PATH", str(bindir))

        paths = [
            vx.write_smplx_npz(
                tmp_path / f"seq_{i}" / f"x_seq{i}.npz",
                np.zeros((4, 55, 3)), np.zeros((4, 3)), subject="scott",
            )
            for i in range(2)
        ]
        wav = tmp_path / "a.wav"
        wav.write_bytes(b"")
        videos = vx.render_windows(paths, wav_path=wav)
        assert len(videos) == 2
        assert all(v.name.endswith("_audio.mp4") for v in videos)
        calls = log.read_text().splitlines()
        blender_calls = [c for c in calls if "blender" in c.split()[0]]
        ffmpeg_calls = [c for c in calls if "ffmpeg" in c.split()[0]]
        assert len(blender_calls) == 2 and len(ffmpeg_calls) == 2
        # second window's audio slice starts at 10 s
        assert "-ss 10.0" in ffmpeg_calls[1]

        assert vx.concat_grid(videos, tmp_path / "grid.mp4", cols=2)
        assert "xstack=inputs=2:layout=0_0|w0_0" in log.read_text()

    def test_render_windows_numeric_ordering(self, tmp_path, monkeypatch):
        """11 windows: seq_10's audio offset must be 100 s, not the 20 s a
        lexicographic sort (seq_0, seq_1, seq_10, seq_2, ...) would give."""
        monkeypatch.setattr(vx, "have_binary", lambda name: True)
        monkeypatch.setattr(
            vx, "render_with_blender", lambda npz, out, **kw: True
        )
        offsets = {}

        def fake_mux(video, wav, out, offset=0.0, duration=10.0):
            offsets[Path(video).parts[-2]] = offset
            return True

        monkeypatch.setattr(vx, "mux_audio", fake_mux)
        paths = [
            vx.write_smplx_npz(
                tmp_path / f"seq_{i}" / f"x_seq{i}.npz",
                np.zeros((4, 55, 3)), np.zeros((4, 3)), subject="scott",
            )
            for i in range(11)
        ]
        vx.render_windows(paths, wav_path=tmp_path / "a.wav")
        assert offsets["seq_10"] == 100.0
        assert offsets["seq_2"] == 20.0


class TestShippedPresets:
    TASKS = ("train_audio", "train_gesture", "prepare_data",
             "infer_gesture", "edit_gesture", "bvh2smplx_")

    @pytest.mark.parametrize("task", TASKS)
    def test_preset_loads(self, task):
        cfg = load_config(str(CONFIGS / f"{task}.json"))
        assert cfg.data.window_frames == 300

    def test_flagship_knobs_match_reference(self):
        g = load_config(str(CONFIGS / "train_gesture.json")).gesture
        # configs/base_new.json:281,293,310-312 + diff_latent_v2.json
        assert (g.epochs, g.batch_size, g.model_save_freq) == (12000, 32, 200)
        assert g.smplx_rep == "6D" and g.vtex_displacement
        a = load_config(str(CONFIGS / "train_audio.json")).audio
        assert (a.epochs, a.batch_size, a.learning_rate) == (25, 1, 1e-5)

    def test_unknown_key_is_an_error(self):
        with pytest.raises(SystemExit, match="unknown config key"):
            load_config(None, {"gesture": {"epochz": 3}})

    def test_comment_keys_ignored(self):
        cfg = load_config(None, {"_doc": "hi", "gesture": {"_note": "x", "epochs": 3}})
        assert cfg.gesture.epochs == 3

    def test_string_override_of_tuple_field(self):
        """--set test.actors=wayne must yield ('wayne',), not
        ('w','a','y','n','e'); comma lists split."""
        cfg = load_config(None, {"test": {"actors": "wayne"}})
        assert cfg.test.actors == ("wayne",)
        cfg = load_config(None, {"test": {"actors": "wayne,scott"}})
        assert cfg.test.actors == ("wayne", "scott")
        cfg = load_config(None, {"test": {"actors": ["wayne", "scott"]}})
        assert cfg.test.actors == ("wayne", "scott")


class TestRenderSceneParameterization:
    """The one parameterized studio scene replacing the reference's five
    near-duplicate render_smpl*.py scripts: preset table completeness, CLI
    argv round-trip, and knob threading from cfg.viz to the blender argv."""

    def _render_mod(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "render_npz", vx.DEFAULT_RENDER_SCRIPT
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # must import WITHOUT bpy present
        return mod

    def test_preset_table_is_complete(self):
        m = self._render_mod()
        for name, p in m.PRESETS.items():
            assert set(p) == {"cam", "cam_rot_x_deg", "wall_y", "material",
                              "arm_rot_x_deg", "armature_z"}, name
            assert p["material"] in m.MATERIALS
        # per-gender floor heights (render_smpl.py:40-44 npz branch)
        assert m.FLOOR_Z["male"] == -1.42961
        assert m.FLOOR_Z["female"] == -1.13961
        # the half/show variants share the upper-body camera
        assert m.PRESETS["half"]["cam"] == m.PRESETS["show"]["cam"] == (0.0, -2.5, 0.0)
        # show: -90deg X + absolute z assignment (render_smpl_show.py:105-106);
        # full/half: +90deg X, armature left where the addon put it
        assert m.PRESETS["show"]["arm_rot_x_deg"] == -90.0
        assert m.PRESETS["show"]["armature_z"] == -0.71
        assert m.PRESETS["full"]["arm_rot_x_deg"] == 90.0
        assert m.PRESETS["full"]["armature_z"] is None
        assert m.PRESETS["half"]["armature_z"] is None

    def test_argv_round_trip(self):
        m = self._render_mod()
        argv = vx.blender_argv(
            "a.npz", "b.mp4", "script.py", fps=25.0, engine="CYCLES",
            preset="show", resolution=512, samples=64,
        )
        cfg = m.parse_argv(argv[argv.index("--") + 1:])
        assert cfg == {"npz": "a.npz", "video": "b.mp4", "fps": 25.0,
                       "engine": "CYCLES", "preset": "show",
                       "resolution": 512, "samples": 64}

    def test_parse_argv_defaults_and_normalization(self):
        m = self._render_mod()
        cfg = m.parse_argv(["x.npz", "y.mp4"])
        assert cfg["fps"] == 30.0 and cfg["preset"] == "full"
        assert cfg["resolution"] == 1024 and cfg["samples"] == 0
        assert m.parse_argv(["x", "y", "30", "EEVEE"])["engine"] == "BLENDER_EEVEE"
        with pytest.raises(ValueError):
            m.parse_argv(["x", "y", "30", "METAL"])
        with pytest.raises(ValueError):
            m.parse_argv(["x", "y", "30", "CYCLES", "closeup"])

    def test_viz_config_reaches_blender_argv(self, tmp_path, monkeypatch):
        calls = []
        monkeypatch.setattr(vx, "have_binary", lambda name: True)

        def fake_run(argv, **kw):
            calls.append(argv)
            Path(argv[argv.index("--") + 2]).touch()

            class R:
                returncode = 0
                stderr = ""

            return R()

        monkeypatch.setattr(vx.subprocess, "run", fake_run)
        p = vx.write_smplx_npz(
            tmp_path / "seq_0" / "x.npz", np.zeros((4, 55, 3)),
            np.zeros((4, 3)), subject="scott",
        )
        vx.render_windows([p], engine="CYCLES", preset="half",
                          resolution=256, samples=8)
        tail = calls[0][calls[0].index("--") + 1:]
        assert tail[3:] == ["CYCLES", "half", "256", "8"]

    def test_cli_viz_block_merges(self):
        cfg = load_config(None, overrides={
            "viz": {"preset": "show", "engine": "CYCLES", "resolution": 512}
        })
        assert (cfg.viz.preset, cfg.viz.engine, cfg.viz.resolution,
                cfg.viz.samples) == ("show", "CYCLES", 512, 0)
