"""Round-trip and invariant tests for amuse_tpu.core.rotations.

The stage-2 pipeline depends on exact aa->6D->aa round-trips
(reference: scripts/trainer.py:363-430); these tests pin that behaviour.
"""

import jax
import jax.numpy as jnp
from pathlib import Path

import numpy as np
import pytest

from amuse_tpu.core import motion, rotations


def random_axis_angle(key, shape, max_angle=3.0):
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, shape + (3,))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, shape + (1,), minval=1e-4, maxval=max_angle)
    return axis * angle


class TestAxisAngleMatrix:
    def test_round_trip(self):
        aa = random_axis_angle(jax.random.key(0), (64,))
        mat = rotations.axis_angle_to_matrix(aa)
        back = rotations.matrix_to_axis_angle(mat)
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-5)

    def test_orthonormal(self):
        aa = random_axis_angle(jax.random.key(1), (32,))
        mat = rotations.axis_angle_to_matrix(aa)
        eye = jnp.einsum("bij,bkj->bik", mat, mat)
        np.testing.assert_allclose(
            np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-6
        )
        det = jnp.linalg.det(mat)
        np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-6)

    def test_zero_rotation(self):
        mat = rotations.axis_angle_to_matrix(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(mat), np.eye(3), atol=1e-7)
        aa = rotations.matrix_to_axis_angle(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(aa), np.zeros(3), atol=1e-7)

    def test_known_rotation_z_90(self):
        aa = jnp.array([0.0, 0.0, jnp.pi / 2])
        mat = rotations.axis_angle_to_matrix(aa)
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(np.asarray(mat), expected, atol=1e-6)

    def test_near_pi_angles(self):
        # The quaternion extraction must stay stable near angle = pi.
        axis = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.577350269, 0.577350269, 0.577350269]])
        aa = axis * (jnp.pi - 1e-4)
        back = rotations.matrix_to_axis_angle(rotations.axis_angle_to_matrix(aa))
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-3)


class TestRotation6D:
    def test_round_trip_via_matrix(self):
        aa = random_axis_angle(jax.random.key(2), (128,))
        mat = rotations.axis_angle_to_matrix(aa)
        d6 = rotations.matrix_to_rotation_6d(mat)
        assert d6.shape == (128, 6)
        back = rotations.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(back), np.asarray(mat), atol=1e-5)

    def test_6d_is_first_two_rows(self):
        aa = random_axis_angle(jax.random.key(3), (4,))
        mat = rotations.axis_angle_to_matrix(aa)
        d6 = rotations.matrix_to_rotation_6d(mat)
        np.testing.assert_allclose(
            np.asarray(d6), np.asarray(mat)[:, :2, :].reshape(4, 6), atol=0
        )

    def test_gram_schmidt_on_noisy_6d(self):
        # A perturbed 6D vector must still map to a valid rotation.
        aa = random_axis_angle(jax.random.key(4), (16,))
        d6 = rotations.axis_angle_to_rotation_6d(aa)
        d6_noisy = d6 + 0.05 * jax.random.normal(jax.random.key(5), d6.shape)
        mat = rotations.rotation_6d_to_matrix(d6_noisy)
        eye = jnp.einsum("bij,bkj->bik", mat, mat)
        np.testing.assert_allclose(
            np.asarray(eye), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )

    def test_full_aa_6d_aa_round_trip(self):
        aa = random_axis_angle(jax.random.key(6), (300, 55))
        back = rotations.rotation_6d_to_axis_angle(
            rotations.axis_angle_to_rotation_6d(aa)
        )
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-4)


class TestMotionPacking:
    def test_feats6d_shapes(self):
        m = jax.random.normal(jax.random.key(7), (2, 300, motion.RAW_FEATS)) * 0.1
        f6 = motion.axis_angle_to_feats6d(m)
        assert f6.shape == (2, 300, motion.FEATS_6D)
        poses, trans = motion.feats6d_to_axis_angle(f6)
        assert poses.shape == (2, 300, 55, 3)
        assert trans.shape == (2, 300, 3)
        np.testing.assert_allclose(np.asarray(trans), np.asarray(m[..., -3:]), atol=0)

    def test_feats6d_round_trip(self):
        aa = np.asarray(random_axis_angle(jax.random.key(8), (1, 300, 55)))
        trans = np.random.default_rng(0).normal(size=(1, 300, 3)).astype(np.float32)
        m = jnp.concatenate(
            [jnp.asarray(aa.reshape(1, 300, -1), jnp.float32), jnp.asarray(trans)], axis=-1
        )
        poses, trans_out = motion.feats6d_to_axis_angle(motion.axis_angle_to_feats6d(m))
        np.testing.assert_allclose(np.asarray(poses), aa, atol=1e-4)

    def test_windowing(self):
        m = jnp.arange(650 * 4, dtype=jnp.float32).reshape(650, 4)
        w = motion.window_motion(m, 300)
        assert w.shape == (2, 300, 4)
        np.testing.assert_allclose(np.asarray(w[0]), np.asarray(m[:300]), atol=0)
        np.testing.assert_allclose(np.asarray(w[1]), np.asarray(m[300:600]), atol=0)

    def test_zero_jaw(self):
        poses = jnp.ones((5, 55, 3))
        z = motion.zero_jaw(poses)
        assert float(jnp.sum(jnp.abs(z[:, motion.JAW_JOINT]))) == 0.0
        assert float(jnp.sum(jnp.abs(z[:, 21]))) > 0.0

    @pytest.mark.skipif(
        not Path('/root/reference/dm/utils/sample_short.npz').exists(),
        reason='reference tree not present',
    )
    def test_reference_sample_npz_round_trip(self):
        # Golden input bundled with the reference: SMPL-X MoSh poses (T,165).
        d = np.load("/root/reference/dm/utils/sample_short.npz", allow_pickle=True)
        poses = d["poses"].reshape(d["poses"].shape[0], 55, 3).astype(np.float32)
        back = rotations.rotation_6d_to_axis_angle(
            rotations.axis_angle_to_rotation_6d(jnp.asarray(poses))
        )
        np.testing.assert_allclose(np.asarray(back), poses, atol=2e-4)


def test_jit_and_vmap_compatible():
    aa = random_axis_angle(jax.random.key(9), (8, 55))
    f = jax.jit(jax.vmap(rotations.axis_angle_to_rotation_6d))
    out = f(aa)
    assert out.shape == (8, 55, 6)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_gradients_finite():
    aa = random_axis_angle(jax.random.key(10), (4,))
    g = jax.grad(lambda x: jnp.sum(rotations.axis_angle_to_rotation_6d(x)))(aa)
    assert bool(jnp.all(jnp.isfinite(g)))
    d6 = rotations.axis_angle_to_rotation_6d(aa)
    g2 = jax.grad(lambda x: jnp.sum(rotations.rotation_6d_to_matrix(x)))(d6)
    assert bool(jnp.all(jnp.isfinite(g2)))
