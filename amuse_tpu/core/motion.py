"""Motion feature packing: SMPL-X pose windows <-> model feature vectors.

The stage-2 unit of work is a 300-frame window of SMPL-X poses at 30 fps:
55 joints x axis-angle(3) + root translation(3) = 168 raw features, or
55 x 6D(6) + 3 = 333 features in the 6D representation the flagship config
trains on (reference: scripts/trainer.py:363-369, configs/base_new.json
``smplx_rep: 6D``). These helpers are pure reshapes/conversions so the whole
train/infer step stays inside one jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amuse_tpu.core import rotations

NUM_JOINTS = 55
RAW_FEATS = NUM_JOINTS * 3 + 3  # 168
FEATS_6D = NUM_JOINTS * 6 + 3  # 333
WINDOW_FRAMES = 300  # 10 s at 30 fps
JAW_JOINT = 22  # zeroed when exporting npz (reference: visualizer.py:196)
LOWER_BODY_JOINTS = (1, 2, 4, 5, 7, 8, 10, 11)


def axis_angle_to_feats6d(motion: jax.Array) -> jax.Array:
    """(..., T, 168) axis-angle+trans -> (..., T, 333) 6D+trans."""
    poses, trans = motion[..., :-3], motion[..., -3:]
    aa = poses.reshape(poses.shape[:-1] + (NUM_JOINTS, 3))
    d6 = rotations.axis_angle_to_rotation_6d(aa)
    d6 = d6.reshape(d6.shape[:-2] + (NUM_JOINTS * 6,))
    return jnp.concatenate([d6, trans], axis=-1)


def feats6d_to_axis_angle(feats: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., T, 333) -> poses (..., T, 55, 3) axis-angle and trans (..., T, 3)."""
    d6, trans = feats[..., :-3], feats[..., -3:]
    d6 = d6.reshape(d6.shape[:-1] + (NUM_JOINTS, 6))
    aa = rotations.rotation_6d_to_axis_angle(d6)
    return aa, trans


def feats3d_split(feats: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., T, 168) -> poses (..., T, 55, 3) and trans (..., T, 3)."""
    poses, trans = feats[..., :-3], feats[..., -3:]
    return poses.reshape(poses.shape[:-1] + (NUM_JOINTS, 3)), trans


def featurize(motion: jax.Array, rep: str = "6D", skip_trans: bool = False) -> jax.Array:
    """Raw (..., T, 168) axis-angle+trans -> the configured feature space.

    The reference trains the prior/diffusion stack on either 6D+trans (333,
    trainer.py:363-369) or raw axis-angle (smplx_rep="3D": 168, or 165 with
    skip_trans - trainer.py:373-376, denoiser.py:24-27).
    """
    if rep == "6D":
        if skip_trans:  # denoiser.py:27 asserts skip_trans is 3D-only
            raise ValueError("skip_trans is only valid with smplx_rep='3D'")
        return axis_angle_to_feats6d(motion)
    if rep != "3D":
        raise ValueError(f"smplx_rep must be '6D' or '3D', got {rep!r}")
    return motion[..., :-3] if skip_trans else motion


def defeaturize(
    feats: jax.Array, rep: str = "6D", skip_trans: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Feature space -> (poses (..., T, 55, 3) axis-angle, trans (..., T, 3)).

    With skip_trans the translation was never modelled: returns zeros (the
    reference's own 3D split at trainer.py:429-431 slices F[..., :-3]/-3:
    even when skip_trans dropped the translation, silently misreading joint
    rotations as metres - we return the sane zero translation instead).
    """
    if rep == "6D":
        return feats6d_to_axis_angle(feats)
    if rep != "3D":
        raise ValueError(f"smplx_rep must be '6D' or '3D', got {rep!r}")
    if skip_trans:
        poses = feats.reshape(feats.shape[:-1] + (NUM_JOINTS, 3))
        return poses, jnp.zeros(feats.shape[:-1] + (3,), feats.dtype)
    return feats3d_split(feats)


def zero_jaw(poses: jax.Array) -> jax.Array:
    """Zero the jaw joint before export (reference: visualizer.py:196).

    Accepts jax OR numpy input: export call sites hold host-side numpy
    (infer/editing results are materialised before npz writing).
    """
    return jnp.asarray(poses).at[..., JAW_JOINT, :].set(0.0)


def window_motion(motion: jax.Array, frames_per_window: int = WINDOW_FRAMES) -> jax.Array:
    """(T, F) -> (T // W, W, F): deterministic non-overlapping windows.

    Mirrors the reference's scaling mechanism for arbitrary-length sequences
    (dm/dm.py:617-661, infer_ldm.py:454-457): long inputs become a *batch* of
    fixed-size windows; the batch dim is what gets data-parallel sharded.
    """
    n = (motion.shape[0] // frames_per_window) * frames_per_window
    return motion[:n].reshape(-1, frames_per_window, motion.shape[-1])
