"""Execute the bpy-side shim scripts (bake_face / retarget_bvh /
setup_addons) against recording fake ``bpy`` modules.

Blender is not in this image, so these scripts otherwise run only in the
field; faking bpy executes their real control flow: the shape-key column
pairing (whose missing-name shift bug is called out in bake_face.py:52-54),
the exclusive-value OBJ dump loop, the ARP retarget op sequence, and the
addon enable/probe actions. Reference analogs: the FaceBaker addon
(models/diffusion/viz/addons/facebaker.py), the
retarget_smpl2bvh2beatnpzWbetas.py workhorse, and enableaddon.py.
"""

import json
import runpy
import sys
import types
from pathlib import Path

import numpy as np
import pytest

SHIMS = Path(__file__).parents[1] / "amuse_tpu" / "viz" / "blender"


# ------------------------------------------------------------ fake pieces
class _Block:
    def __init__(self, name):
        self.name = name
        self.value = 0.0
        self.keyed = []  # (frame, value at key time)

    def keyframe_insert(self, prop, frame=None):
        assert prop == "value"
        self.keyed.append((frame, self.value))


class _ShapeKeys:
    def __init__(self, names):
        self.key_blocks = [_Block(n) for n in names]
        self.animation_data = types.SimpleNamespace(action=object())
        self.cleared = 0

    def animation_data_clear(self):
        self.cleared += 1
        self.animation_data = None


class _MeshObj:
    def __init__(self, key_names):
        self.type = "MESH"
        self.data = types.SimpleNamespace(shape_keys=_ShapeKeys(key_names))
        self.selected = None

    def select_set(self, v):
        self.selected = v


def fake_bpy_for_bake(mesh_name, key_names):
    bpy = types.ModuleType("bpy")
    obj = _MeshObj(key_names)
    bpy.data = types.SimpleNamespace(objects={mesh_name: obj})
    bpy.data.objects = types.SimpleNamespace(get=lambda n: obj if n == mesh_name else None)
    bpy.context = types.SimpleNamespace(
        scene=types.SimpleNamespace(
            render=types.SimpleNamespace(fps=None), frame_end=0
        ),
        view_layer=types.SimpleNamespace(
            objects=types.SimpleNamespace(active=None)
        ),
    )
    bpy.exports = []

    def obj_export(filepath=None, export_selected_objects=None):
        # record which keys are "on" AT EXPORT TIME (values mutate between calls)
        on = [b.name for b in obj.data.shape_keys.key_blocks if b.value == 1.0]
        bpy.exports.append((filepath, tuple(on)))

    bpy.ops = types.SimpleNamespace(
        object=types.SimpleNamespace(select_all=lambda action: None),
        wm=types.SimpleNamespace(obj_export=obj_export),
    )
    return bpy, obj


def _run(script, argv, bpy, extra_modules=()):
    saved = sys.argv
    sys.modules["bpy"] = bpy
    for name, mod in extra_modules:
        sys.modules[name] = mod
    try:
        sys.argv = ["blender", "-b", "-P", str(script), "--", *argv]
        runpy.run_path(str(script), run_name="__main__")
    finally:
        sys.argv = saved
        sys.modules.pop("bpy", None)
        for name, _ in extra_modules:
            sys.modules.pop(name, None)


# ------------------------------------------------------------------- tests
class TestBakeFace:
    def test_json_missing_name_does_not_shift_columns(self, tmp_path):
        """The exact bug bake_face.py:52-54 defends against: weight name
        'X' absent from the mesh must skip ONLY its column - 'C' still
        gets column 2, not X's 0.9."""
        bpy, obj = fake_bpy_for_bake("Face", ["Basis", "A", "B", "C"])
        w = tmp_path / "w.json"
        w.write_text(json.dumps(
            {"names": ["A", "X", "C"], "frames": [[0.1, 0.9, 0.3], [0.4, 0.8, 0.6]]}
        ))
        _run(SHIMS / "bake_face.py", ["bake", "Face", str(w), "25"], bpy)
        a, b, c = obj.data.shape_keys.key_blocks[1:]
        assert a.keyed == [(1, 0.1), (2, 0.4)]
        assert c.keyed == [(1, 0.3), (2, 0.6)]
        assert b.keyed == []  # no weight named B
        assert obj.data.shape_keys.cleared == 1  # old animation dropped
        assert bpy.context.scene.render.fps == 25
        assert bpy.context.scene.frame_end == 2

    def test_npz_expressions_key_first_columns(self, tmp_path):
        bpy, obj = fake_bpy_for_bake("Face", ["Basis", "Exp000", "Exp001", "Exp002"])
        p = tmp_path / "w.npz"
        np.savez(p, expressions=np.array([[0.5, 0.25], [0.75, 0.125]], np.float32))
        _run(SHIMS / "bake_face.py", ["bake", "Face", str(p)], bpy)
        e0, e1, e2 = obj.data.shape_keys.key_blocks[1:]
        assert e0.keyed == [(1, 0.5), (2, 0.75)]
        assert e1.keyed == [(1, 0.25), (2, 0.125)]
        assert e2.keyed == []  # only the npz's E=2 columns are keyed
        assert bpy.context.scene.render.fps == 30  # default

    def test_dump_exports_each_key_exclusively(self, tmp_path):
        bpy, obj = fake_bpy_for_bake("Face", ["Basis", "Jaw", "Brow"])
        out = tmp_path / "objs"
        _run(SHIMS / "bake_face.py", ["dump", "Face", str(out)], bpy)
        assert [Path(f).name for f, _ in bpy.exports] == [
            "0000_Jaw.obj", "0001_Brow.obj"
        ]
        # exclusive: exactly the dumped key at 1.0 per export
        assert [on for _, on in bpy.exports] == [("Jaw",), ("Brow",)]

    def test_missing_mesh_is_a_clean_exit(self, tmp_path):
        bpy, _ = fake_bpy_for_bake("Face", ["Basis", "A"])
        with pytest.raises(SystemExit, match="no mesh object"):
            _run(SHIMS / "bake_face.py", ["bake", "Ghost", "w.json"], bpy)


class TestRetargetBvh:
    def test_op_sequence_and_export_target(self, tmp_path):
        bpy = types.ModuleType("bpy")
        calls = []
        rigs = []

        def import_bvh(filepath=None, rotate_mode=None):
            calls.append(("import", filepath, rotate_mode))
            rig = types.SimpleNamespace(
                name=f"rig{len(rigs)}", selected=None,
                select_set=lambda v, _r=None: None,
            )
            rig.select_set = lambda v, _rig=rig: setattr(_rig, "selected", v)
            rigs.append(rig)
            bpy.context.selected_objects = [rig]

        scn = types.SimpleNamespace(source_rig=None, target_rig=None)
        bpy.context = types.SimpleNamespace(
            scene=scn, selected_objects=[],
            view_layer=types.SimpleNamespace(
                objects=types.SimpleNamespace(active=None)
            ),
        )
        bpy.ops = types.SimpleNamespace(
            wm=types.SimpleNamespace(
                read_factory_settings=lambda use_empty: calls.append(("factory",))
            ),
            import_anim=types.SimpleNamespace(bvh=import_bvh),
            arp=types.SimpleNamespace(
                import_config=lambda filepath: calls.append(("arp_config", filepath)),
                auto_scale=lambda: calls.append(("arp_auto_scale",)),
                retarget=lambda: calls.append(("arp_retarget",)),
            ),
            object=types.SimpleNamespace(select_all=lambda action: None),
            export_anim=types.SimpleNamespace(
                bvh=lambda filepath, root_transform_only: calls.append(
                    ("export", filepath, root_transform_only)
                )
            ),
        )
        _run(
            SHIMS / "retarget_bvh.py",
            ["beat.bvh", "tpose.bvh", "out.npz", "map.json", "scott"],
            bpy,
        )
        # source = BEAT import, target = T-pose import (order matters)
        assert scn.source_rig == "rig0" and scn.target_rig == "rig1"
        assert ("arp_config", "map.json") in calls
        assert calls.index(("arp_auto_scale",)) < calls.index(("arp_retarget",))
        export = next(c for c in calls if c[0] == "export")
        assert export[1] == "out.npz.retargeted.bvh" and export[2] is False
        assert rigs[1].selected is True  # the TARGET rig is what gets exported

    def test_preset_optional(self):
        bpy = types.ModuleType("bpy")
        calls = []

        def import_bvh(filepath=None, rotate_mode=None):
            rig = types.SimpleNamespace(name="r", select_set=lambda v: None)
            bpy.context.selected_objects = [rig]

        bpy.context = types.SimpleNamespace(
            scene=types.SimpleNamespace(source_rig=None, target_rig=None),
            selected_objects=[],
            view_layer=types.SimpleNamespace(
                objects=types.SimpleNamespace(active=None)
            ),
        )
        bpy.ops = types.SimpleNamespace(
            wm=types.SimpleNamespace(read_factory_settings=lambda use_empty: None),
            import_anim=types.SimpleNamespace(bvh=import_bvh),
            arp=types.SimpleNamespace(
                import_config=lambda filepath: calls.append("config"),
                auto_scale=lambda: None,
                retarget=lambda: None,
            ),
            object=types.SimpleNamespace(select_all=lambda action: None),
            export_anim=types.SimpleNamespace(bvh=lambda **kw: None),
        )
        _run(SHIMS / "retarget_bvh.py", ["b.bvh", "t.bvh", "o.npz"], bpy)
        assert calls == []  # no preset arg -> no arp.import_config call


class TestSetupAddons:
    def _fake(self, enable_fail=()):
        bpy = types.ModuleType("bpy")
        calls = []

        def addon_enable(module=None):
            if module in enable_fail:
                raise RuntimeError(f"no module {module}")
            calls.append(("enable", module))

        bpy.ops = types.SimpleNamespace(
            preferences=types.SimpleNamespace(
                addon_install=lambda filepath, overwrite: calls.append(
                    ("install", filepath)
                ),
                addon_enable=addon_enable,
            ),
            wm=types.SimpleNamespace(
                save_userpref=lambda: calls.append(("save",))
            ),
        )
        bpy.app = types.SimpleNamespace(version_string="4.1.0")
        bpy.context = types.SimpleNamespace(
            preferences=types.SimpleNamespace(
                addons=[types.SimpleNamespace(module="smplx_blender_addon")]
            )
        )
        addon_utils = types.ModuleType("addon_utils")
        addon_utils.modules = lambda: [types.SimpleNamespace(__name__="auto_rig_pro")]
        return bpy, addon_utils, calls

    def test_install_then_saves_prefs(self):
        bpy, au, calls = self._fake()
        _run(
            SHIMS / "setup_addons.py", ["install", "a.zip", "b.zip"], bpy,
            extra_modules=[("addon_utils", au)],
        )
        assert calls == [("install", "a.zip"), ("install", "b.zip"), ("save",)]

    def test_enable_failure_reports_and_exits_nonzero(self):
        bpy, au, calls = self._fake(enable_fail={"ghost"})
        with pytest.raises(SystemExit):
            _run(
                SHIMS / "setup_addons.py", ["enable", "smplx", "ghost"], bpy,
                extra_modules=[("addon_utils", au)],
            )
        # the good module was still enabled and prefs still saved
        assert ("enable", "smplx") in calls and ("save",) in calls

    def test_probe_prints_json(self, capsys):
        bpy, au, _ = self._fake()
        _run(
            SHIMS / "setup_addons.py", ["probe"], bpy,
            extra_modules=[("addon_utils", au)],
        )
        line = next(
            ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("BLPROBE:")
        )
        info = json.loads(line[len("BLPROBE:"):])
        assert info["version"] == "4.1.0"
        assert info["modules"] == ["auto_rig_pro"]
        assert info["enabled"] == ["smplx_blender_addon"]
