"""Blender-side retarget script: BEAT BVH -> SMPL-X npz.

Runs INSIDE Blender (the reference's bvh2smplx_ workhorse role,
retarget_smpl2bvh2beatnpzWbetas.py):

    blender -b -P retarget_bvh.py -- <beat.bvh> <tpose_smplx.bvh> <out.npz> [preset.json] [subject]

Requires the Auto-Rig-Pro add-on (``bpy.ops.arp.retarget``) with a bone-map
preset for BEAT -> SMPL-X (supplied as a JSON path). After ARP retargets the
animation onto the SMPL-X rig, the exported Euler curves are converted to the
55-joint axis-angle npz layout by amuse_tpu.data.bvh (pure numpy) - the
Euler->quat->axis-angle math lives in the framework, not in this thin
Blender shim.
"""

import sys


def main():
    import bpy

    argv = sys.argv[sys.argv.index("--") + 1 :]
    beat_bvh, tpose_bvh, out_npz = argv[0], argv[1], argv[2]
    preset = argv[3] if len(argv) > 3 else ""
    subject = argv[4] if len(argv) > 4 else ""

    bpy.ops.wm.read_factory_settings(use_empty=True)
    # source: BEAT capture
    bpy.ops.import_anim.bvh(filepath=beat_bvh, rotate_mode="NATIVE")
    source = bpy.context.selected_objects[0]
    # target: SMPL-X T-pose rig
    bpy.ops.import_anim.bvh(filepath=tpose_bvh, rotate_mode="NATIVE")
    target = bpy.context.selected_objects[0]

    # Auto-Rig-Pro retarget with the BEAT->SMPL-X preset
    scn = bpy.context.scene
    scn.source_rig = source.name
    scn.target_rig = target.name
    if preset:
        bpy.ops.arp.import_config(filepath=preset)
    bpy.ops.arp.auto_scale()
    bpy.ops.arp.retarget()

    # export the retargeted rig back to BVH next to the npz, then convert
    retargeted_bvh = out_npz + ".retargeted.bvh"
    bpy.ops.object.select_all(action="DESELECT")
    target.select_set(True)
    bpy.context.view_layer.objects.active = target
    bpy.ops.export_anim.bvh(filepath=retargeted_bvh, root_transform_only=False)

    # numpy conversion (no bpy needed from here on): 55-joint SMPL-X
    # reorder + jaw/eye zeroing + root recentring + gender/betas
    from amuse_tpu.data.bvh import convert_retargeted_bvh_to_npz

    convert_retargeted_bvh_to_npz(retargeted_bvh, out_npz, subject=subject)


if __name__ == "__main__":
    main()
