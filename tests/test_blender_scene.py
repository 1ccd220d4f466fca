"""Execute the Blender scene build against a recording fake ``bpy``.

tests/test_viz_export.py pins the PRESETS constants; this module actually
RUNS ``render_npz.build_scene`` for every preset with a fake bpy module
that records operator calls and object state. Blender itself is not in
this image (docs/PARITY.md render row), so this is the closest executable
check: it would have caught the round-4 advisor finding (show preset
applying +90deg instead of -90deg armature X and shifting the floor), and
it covers the Blender 3.x/4.x socket renames and the 4.2 EEVEE enum
removal the script claims to handle.
"""

import sys
import types
from math import radians
from pathlib import Path

import numpy as np
import pytest

from amuse_tpu.viz import export as vx


# ---------------------------------------------------------------- fake bpy
class _Sock:
    def __init__(self):
        self.default_value = None


class _Inputs:
    def __init__(self, names):
        self._d = {n: _Sock() for n in names}

    def __contains__(self, k):
        return k in self._d

    def __getitem__(self, k):
        return self._d[k]


class _Node:
    def __init__(self, socket_names):
        self.inputs = _Inputs(socket_names)
        self.subsurface_method = None


class _Material:
    def __init__(self, name, socket_names):
        self.name = name
        self.use_nodes = False
        self.node_tree = types.SimpleNamespace(
            nodes={"Principled BSDF": _Node(socket_names)}
        )

    @property
    def bsdf(self):
        return self.node_tree.nodes["Principled BSDF"]


class _ObjData:
    def __init__(self):
        self.materials = []
        # camera / light fields assigned by the script
        self.type = None
        self.lens = None
        self.energy = None
        self.shape = None
        self.size = None

    # the script calls data.materials.clear()/append(); list provides both
    # via this thin holder already (materials IS a list)


class _Object:
    def __init__(self, type_, name=""):
        self.type = type_
        self.name = name
        self.location = [0.0, 0.0, 0.0]
        self.rotation_euler = (0.0, 0.0, 0.0)
        self.data = _ObjData()


class _Render:
    """scene.render with an ``engine`` property that can emulate Blender
    4.2's removal of the BLENDER_EEVEE enum value (TypeError on assign)."""

    def __init__(self, reject_legacy_eevee=False):
        self._reject = reject_legacy_eevee
        self._engine = "BLENDER_EEVEE"
        self.fps = None
        self.resolution_x = None
        self.resolution_y = None
        self.resolution_percentage = None
        self.image_settings = types.SimpleNamespace(file_format=None)
        self.ffmpeg = types.SimpleNamespace(format=None, codec=None)
        self.filepath = None

    @property
    def engine(self):
        return self._engine

    @engine.setter
    def engine(self, v):
        if self._reject and v == "BLENDER_EEVEE":
            raise TypeError("enum \"BLENDER_EEVEE\" not found in ('CYCLES', ...)")
        self._engine = v


def make_fake_bpy(
    socket_names=("Base Color", "Subsurface Weight", "Subsurface Radius"),
    reject_legacy_eevee=False,
):
    bpy = types.ModuleType("bpy")
    scene = types.SimpleNamespace(
        render=_Render(reject_legacy_eevee),
        cycles=types.SimpleNamespace(samples=None, subsurface_samples=None),
        eevee=types.SimpleNamespace(taa_render_samples=None),
        camera=None,
        frame_start=None,
        frame_end=None,
    )
    bpy.context = types.SimpleNamespace(scene=scene, active_object=None)

    class _Materials:
        @staticmethod
        def new(name):
            m = _Material(name, socket_names)
            bpy.data.materials_created.append(m)
            return m

    bpy.data = types.SimpleNamespace(
        objects=[], materials=_Materials(), materials_created=[]
    )
    bpy.calls = []

    def _add(obj):
        bpy.data.objects.append(obj)
        bpy.context.active_object = obj
        return obj

    def camera_add(location=None, **kw):
        bpy.calls.append(("camera_add", location))
        _add(_Object("CAMERA")).location = list(location)

    def light_add(type=None, location=None, rotation=(0, 0, 0), **kw):
        bpy.calls.append(("light_add", type, location, rotation))
        o = _add(_Object("LIGHT"))
        o.location, o.rotation_euler = list(location), rotation
        o.light_type = type

    def plane_add(size=None, location=None, rotation=(0.0, 0.0, 0.0), **kw):
        bpy.calls.append(("plane_add", size, location, rotation))
        o = _add(_Object("MESH"))
        o.location, o.rotation_euler, o.plane_size = list(location), rotation, size

    def smplx_add_animation(filepath=None, target_framerate=None):
        bpy.calls.append(("smplx_add_animation", filepath, target_framerate))
        _add(_Object("ARMATURE", name="SMPLX-armature"))
        _add(_Object("MESH", name="SMPLX-mesh"))

    def read_factory_settings(use_empty=False):
        bpy.calls.append(("read_factory_settings", use_empty))

    bpy.ops = types.SimpleNamespace(
        wm=types.SimpleNamespace(read_factory_settings=read_factory_settings),
        object=types.SimpleNamespace(
            camera_add=camera_add,
            light_add=light_add,
            smplx_add_animation=smplx_add_animation,
        ),
        mesh=types.SimpleNamespace(primitive_plane_add=plane_add),
    )
    return bpy


# ------------------------------------------------------------------ helpers
def _render_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "render_npz_scene", vx.DEFAULT_RENDER_SCRIPT
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def npz(tmp_path):
    T = 7
    return vx.write_smplx_npz(
        tmp_path / "seq_0" / "m.npz", np.zeros((T, 55, 3)), np.zeros((T, 3)),
        subject="scott",
    ), T


def _build(mod, bpy, npz_path, monkeypatch, **over):
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    cfg = {
        "npz": str(npz_path), "video": "out.mp4", "fps": 30.0,
        "engine": "BLENDER_EEVEE", "preset": "full", "resolution": 256,
        "samples": 0,
    }
    cfg.update(over)
    return mod.build_scene(cfg)


def _by_name(bpy, name):
    return next(o for o in bpy.data.objects if o.name == name)


def _armature(bpy):
    return next(o for o in bpy.data.objects if o.type == "ARMATURE")


def _body_mat(bpy):
    body = next(o for o in bpy.data.objects if o.name == "SMPLX-mesh")
    assert len(body.data.materials) == 1
    return body.data.materials[0]


# -------------------------------------------------------------------- tests
class TestBuildScenePresets:
    def test_full_preset(self, npz, monkeypatch):
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, T = npz
        scene = _build(mod, bpy, path, monkeypatch)

        cam = next(o for o in bpy.data.objects if o.type == "CAMERA")
        assert cam.location == [0.0, -4.7, -0.35]  # render_smpl.py:38
        assert cam.rotation_euler[0] == pytest.approx(radians(89.0))
        assert cam.data.lens == 75 and cam.data.type == "PERSP"
        assert scene.camera is cam

        # studio rig: spot key 1200 W + area fill 40 W + disk head 20 W
        lights = [o for o in bpy.data.objects if o.type == "LIGHT"]
        assert sorted(o.data.energy for o in lights) == [20, 40, 1200]
        head = next(o for o in lights if o.data.energy == 20)
        assert head.data.shape == "DISK" and head.data.size == 0.5

        # armature: +90deg X (render_smpl.py:104), import position untouched
        arm = _armature(bpy)
        assert arm.rotation_euler[0] == pytest.approx(radians(90.0))
        assert arm.location[2] == 0.0

        # skin material with Burley subsurface on the 4.x socket name
        mat = _body_mat(bpy)
        node = mat.bsdf
        assert node.inputs["Base Color"].default_value == mod.MATERIALS["skin"][
            "base_color"
        ]
        assert node.subsurface_method == "BURLEY"
        assert node.inputs["Subsurface Weight"].default_value == 0.01
        assert node.inputs["Subsurface Radius"].default_value == (3.67, 1.37, 0.68)

        # floor at the per-gender height from the npz's own gender key
        gender = str(np.load(path, allow_pickle=True)["gender"])
        assert _by_name(bpy, "Floor").location[2] == mod.FLOOR_Z[gender]
        assert _by_name(bpy, "Wall").location[1] == 1.5  # render_smpl.py:130

        assert (scene.frame_start, scene.frame_end) == (1, T)
        assert scene.render.filepath == "out.mp4"
        assert scene.render.engine == "BLENDER_EEVEE"
        assert ("smplx_add_animation", str(path), 30) in bpy.calls

    def test_show_preset_armature_and_floor(self, npz, monkeypatch):
        """The round-4 advisor finding as a regression test: show rotates
        the armature -90deg about X (render_smpl_show.py:105, NOT +90),
        assigns z=-0.71 absolutely, and the floor STAYS at the per-gender
        height (upstream's floor_location is untouched by the shift)."""
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, _ = npz
        _build(mod, bpy, path, monkeypatch, preset="show")

        arm = _armature(bpy)
        assert arm.rotation_euler[0] == pytest.approx(radians(-90.0))
        assert arm.location[2] == -0.71
        gender = str(np.load(path, allow_pickle=True)["gender"])
        assert _by_name(bpy, "Floor").location[2] == mod.FLOOR_Z[gender]
        assert _by_name(bpy, "Wall").location[1] == 0.5
        mat = _body_mat(bpy)
        assert mat.bsdf.inputs["Base Color"].default_value == mod.MATERIALS[
            "blue"
        ]["base_color"]

    def test_half_preset(self, npz, monkeypatch):
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, _ = npz
        _build(mod, bpy, path, monkeypatch, preset="half")
        cam = next(o for o in bpy.data.objects if o.type == "CAMERA")
        assert cam.location == [0.0, -2.5, 0.0]  # render_smpl_half.py:39
        arm = _armature(bpy)
        assert arm.rotation_euler[0] == pytest.approx(radians(90.0))
        assert arm.location[2] == 0.0  # no z assignment outside show

    def test_plain_preset_minimal(self, npz, monkeypatch):
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, _ = npz
        _build(mod, bpy, path, monkeypatch, preset="plain")
        lights = [o for o in bpy.data.objects if o.type == "LIGHT"]
        assert len(lights) == 1 and lights[0].light_type == "SUN"
        names = {o.name for o in bpy.data.objects}
        assert "Floor" not in names and "Wall" not in names


class TestEngineAndSockets:
    def test_eevee_next_fallback(self, npz, monkeypatch):
        """Blender 4.2 removed the BLENDER_EEVEE enum value; assignment
        raises and the script must fall back to BLENDER_EEVEE_NEXT."""
        mod = _render_mod()
        bpy = make_fake_bpy(reject_legacy_eevee=True)
        path, _ = npz
        scene = _build(mod, bpy, path, monkeypatch)
        assert scene.render.engine == "BLENDER_EEVEE_NEXT"

    def test_cycles_samples(self, npz, monkeypatch):
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, _ = npz
        scene = _build(mod, bpy, path, monkeypatch, engine="CYCLES", samples=64)
        assert scene.render.engine == "CYCLES"
        assert scene.cycles.samples == 64
        assert scene.cycles.subsurface_samples == 64

    def test_eevee_samples_knob(self, npz, monkeypatch):
        mod = _render_mod()
        bpy = make_fake_bpy()
        path, _ = npz
        scene = _build(mod, bpy, path, monkeypatch, samples=32)
        assert scene.eevee.taa_render_samples == 32

    def test_subsurface_socket_blender3_name(self, npz, monkeypatch):
        """Blender 3.x names the socket 'Subsurface' (4.x renamed it to
        'Subsurface Weight'); the script addresses whichever exists."""
        mod = _render_mod()
        bpy = make_fake_bpy(
            socket_names=("Base Color", "Subsurface", "Subsurface Radius")
        )
        path, _ = npz
        _build(mod, bpy, path, monkeypatch)  # full -> skin material
        node = _body_mat(bpy).bsdf
        assert node.inputs["Subsurface"].default_value == 0.01
