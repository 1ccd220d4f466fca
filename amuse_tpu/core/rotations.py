"""Rotation conversions (axis-angle <-> matrix <-> 6D <-> quaternion) in pure JAX.

The reference pipeline converts SMPL-X axis-angle poses to a continuous 6D
rotation representation on the way into the motion prior / denoiser and back
to axis-angle on the way out (reference: scripts/trainer.py:363-430,
models/latent_diffusion/infer_ldm.py:168-176, via pytorch3d.transforms).

All functions below are shape-polymorphic over leading batch dims, jit- and
vmap-safe (no data-dependent control flow), and validated against round-trip
identities in tests/test_rotations.py.

Conventions match the common "Zhou et al. 2019" 6D representation used by
pytorch3d: the 6D vector is the first two *rows* of the rotation matrix, and
`rotation_6d_to_matrix` Gram-Schmidt-orthonormalises them back into rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "matrix_to_rotation_6d",
    "rotation_6d_to_matrix",
    "axis_angle_to_quaternion",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_rotation_6d",
    "rotation_6d_to_axis_angle",
    "rotation_6d_to_matrix_slabs",
]

_EPS = 1e-8


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 4) unit quaternion (w, x, y, z)."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angles
    # sin(half)/angle, with the Taylor expansion 0.5 - angle^2/48 near zero to
    # stay finite and smooth under autodiff.
    small = angles < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angles),
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix (Rodrigues)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) quaternion (w, x, y, z).

    Numerically stable: evaluates all four candidate decompositions and
    selects the one whose squared magnitude (the denominator) is largest.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # 4 * q_i^2 for each component of the quaternion.
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # Candidate quaternions, each scaled by 4*q_abs[i] (normalised below).
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    denoms = 2.0 * jnp.maximum(q_abs, 0.1)  # floor avoids div-by-0 off-branch
    candidates = candidates / denoms[..., None]

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    # Canonicalise to w >= 0 so downstream axis-angle stays in [0, pi].
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_to_axis_angle(quat: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3) axis-angle."""
    norms = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quat[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quat[..., 1:] / sin_half_over_angle


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle, angle in [0, pi]."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows of the matrix, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. 2019)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(jnp.linalg.norm(a2_proj, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def rotation_6d_to_matrix_slabs(cols: tuple) -> tuple:
    """Componentwise Gram-Schmidt: 6 same-shape arrays (the 6D components,
    each typically a TPU-friendly (N, J) slab) -> 9 arrays, row-major
    (r00, r01, r02, r10, ..., r22).

    Same math as :func:`rotation_6d_to_matrix` without ever materialising a
    (..., 3, 3) tensor: trailing size-3 dims tile as (8, 128) on TPU, so any
    fusion boundary around them pads HBM traffic ~40x. The slab form keeps
    every intermediate 2D with the large axis last (used by the SMPL-X
    vertex-monitor path, core/smplx.py::soc_monitor_vertices).
    """
    x0, x1, x2, x3, x4, x5 = cols
    d1 = jnp.maximum(jnp.sqrt(x0 * x0 + x1 * x1 + x2 * x2), _EPS)
    b10, b11, b12 = x0 / d1, x1 / d1, x2 / d1
    dot = b10 * x3 + b11 * x4 + b12 * x5
    u0, u1, u2 = x3 - dot * b10, x4 - dot * b11, x5 - dot * b12
    d2 = jnp.maximum(jnp.sqrt(u0 * u0 + u1 * u1 + u2 * u2), _EPS)
    b20, b21, b22 = u0 / d2, u1 / d2, u2 / d2
    b30 = b11 * b22 - b12 * b21
    b31 = b12 * b20 - b10 * b22
    b32 = b10 * b21 - b11 * b20
    return (b10, b11, b12, b20, b21, b22, b30, b31, b32)


def axis_angle_to_rotation_6d(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 6). Fused convenience used by the training step."""
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3). Fused convenience used at decode time."""
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))
