"""Blender-side render script: SMPL-X animation npz -> mp4.

Runs INSIDE Blender's bundled Python (the reference's render_smpl*.py role):

    blender -b -P render_npz.py -- <npz> <out.mp4> <fps> [EEVEE|CYCLES]

Requires the SMPL-X Blender add-on (smplx_blender_addon) to be installed and
enabled - it provides ``object.smplx_add_animation`` which imports our npz
(keys: poses (T,55,3), trans, gender, betas, mocap_frame_rate; written by
amuse_tpu.viz.export.write_smplx_npz). This script only does scene plumbing:
camera, light, engine, encoding. It is intentionally minimal - rendering is
CPU post-processing, not part of the TPU path.
"""

import sys


def main():
    import bpy  # only available inside Blender

    argv = sys.argv[sys.argv.index("--") + 1 :]
    npz_path, out_video = argv[0], argv[1]
    fps = float(argv[2]) if len(argv) > 2 else 30.0
    engine = argv[3] if len(argv) > 3 else "BLENDER_EEVEE"

    # clean scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = engine
    scene.render.fps = int(fps)

    # camera
    cam_data = bpy.data.cameras.new("cam")
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    cam.location = (0.0, -3.2, 1.1)
    cam.rotation_euler = (1.45, 0.0, 0.0)
    scene.camera = cam

    # light
    light_data = bpy.data.lights.new("sun", type="SUN")
    light_data.energy = 3.0
    light = bpy.data.objects.new("sun", light_data)
    scene.collection.objects.link(light)
    light.location = (1.5, -2.0, 3.0)

    # import the animation via the SMPL-X addon
    bpy.ops.object.smplx_add_animation(filepath=npz_path)

    # frame range from the imported action
    import numpy as np

    n_frames = int(np.load(npz_path)["poses"].shape[0])
    scene.frame_start, scene.frame_end = 1, n_frames

    # output
    scene.render.image_settings.file_format = "FFMPEG"
    scene.render.ffmpeg.format = "MPEG4"
    scene.render.ffmpeg.codec = "H264"
    scene.render.filepath = out_video
    scene.render.resolution_x, scene.render.resolution_y = 1280, 720
    bpy.ops.render.render(animation=True)


if __name__ == "__main__":
    main()
