"""Invariant tests for the JAX SMPL-X forward on a tiny synthetic rig.

(The published SMPL-X model npz files are licensed and not present in CI;
the LBS math is validated structurally: rest pose = template, rigid global
rotation, translation equivariance, jit/vmap compatibility.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.core import smplx
from amuse_tpu.core.rotations import axis_angle_to_matrix


def make():
    return smplx.make_test_model()


class TestRestPose:
    def test_zero_pose_zero_betas_is_template(self):
        m = make()
        out = smplx.forward(
            m,
            jnp.zeros(m.num_joints * 3),
            jnp.zeros(8),
            jnp.zeros(3),
            expression=jnp.zeros(0),
        )
        np.testing.assert_allclose(
            np.asarray(out["vertices"]), np.asarray(m.v_template), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["joints"]),
            np.asarray(m.j_regressor @ m.v_template),
            atol=1e-5,
        )

    def test_betas_shift_by_shapedirs(self):
        m = make()
        betas = jnp.asarray(np.random.default_rng(1).normal(size=8), jnp.float32)
        out = smplx.forward(
            m, jnp.zeros(m.num_joints * 3), betas, jnp.zeros(3), expression=jnp.zeros(0)
        )
        expected = m.v_template + jnp.einsum("vck,k->vc", m.shapedirs, betas)
        np.testing.assert_allclose(np.asarray(out["vertices"]), np.asarray(expected), atol=1e-5)


class TestKinematics:
    def test_translation_equivariance(self):
        m = make()
        poses = jnp.asarray(
            0.3 * np.random.default_rng(2).normal(size=m.num_joints * 3), jnp.float32
        )
        betas = jnp.zeros(8)
        t = jnp.asarray([1.0, -2.0, 0.5])
        a = smplx.forward(m, poses, betas, jnp.zeros(3), expression=jnp.zeros(0))
        b = smplx.forward(m, poses, betas, t, expression=jnp.zeros(0))
        np.testing.assert_allclose(
            np.asarray(b["vertices"]), np.asarray(a["vertices"] + t), atol=1e-5
        )

    def test_global_orient_is_rigid_rotation_about_root(self):
        m = make()
        aa_root = jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32)
        poses = jnp.zeros(m.num_joints * 3).at[:3].set(aa_root)
        # zero pose correctives for a pure rigid check
        m0 = m._replace(posedirs=jnp.zeros_like(m.posedirs))
        out = smplx.forward(m0, poses, jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0))
        root = np.asarray(m.j_regressor @ m.v_template)[0]
        rot = np.asarray(axis_angle_to_matrix(aa_root))
        expected = (np.asarray(m.v_template) - root) @ rot.T + root
        np.testing.assert_allclose(np.asarray(out["vertices"]), expected, atol=1e-4)

    def test_distal_joint_rotation_leaves_template_root_chain(self):
        # Rotating the last joint of the chain must not move the root.
        m = make()
        poses = jnp.zeros(m.num_joints * 3).at[-3:].set(jnp.asarray([0.5, 0.2, -0.1]))
        m0 = m._replace(posedirs=jnp.zeros_like(m.posedirs))
        out = smplx.forward(m0, poses, jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0))
        rest_joints = np.asarray(m.j_regressor @ m.v_template)
        np.testing.assert_allclose(np.asarray(out["joints"][0]), rest_joints[0], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["joints"][:-1]), rest_joints[:-1], atol=1e-5
        )


class TestArticulation:
    def test_middle_joint_rotation_moves_descendants_rigidly(self):
        """Rotating an interior joint must MOVE its descendants (a forward
        that drops body-joint rotations would pass every only-asserts-static
        test) while ancestors stay put and bone lengths are preserved."""
        m = make()
        m0 = m._replace(posedirs=jnp.zeros_like(m.posedirs))
        k = m.num_joints // 2  # interior joint of the chain rig
        poses = jnp.zeros(m.num_joints * 3).at[3 * k : 3 * k + 3].set(
            jnp.asarray([0.0, 0.0, 1.2])
        )
        out = smplx.forward(m0, poses, jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0))
        joints = np.asarray(out["joints"])
        rest = np.asarray(m.j_regressor @ m.v_template)
        # ancestors (and the pivot itself) unmoved
        np.testing.assert_allclose(joints[: k + 1], rest[: k + 1], atol=1e-5)
        # at least one descendant genuinely moved
        assert np.max(np.abs(joints[k + 1 :] - rest[k + 1 :])) > 1e-3
        # rigid: consecutive bone lengths preserved
        np.testing.assert_allclose(
            np.linalg.norm(np.diff(joints, axis=0), axis=1),
            np.linalg.norm(np.diff(rest, axis=0), axis=1),
            atol=1e-5,
        )


class TestBatchedAndJitted:
    def test_forward_batch_shapes(self):
        m = make()
        n = 4
        rng = np.random.default_rng(3)
        poses = jnp.asarray(0.1 * rng.normal(size=(n, m.num_joints * 3)), jnp.float32)
        betas = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        transl = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        out = smplx.forward_batch(m, poses, betas, transl, expression=jnp.zeros(0))
        assert out["vertices"].shape == (n, m.num_vertices, 3)
        assert out["joints"].shape == (n, m.num_joints, 3)

    def test_jit_with_model_closed_over(self):
        m = make()

        @jax.jit
        def f(poses, betas, transl):
            return smplx.forward_batch(m, poses, betas, transl, expression=jnp.zeros(0))

        out = f(jnp.zeros((2, m.num_joints * 3)), jnp.zeros((2, 8)), jnp.zeros((2, 3)))
        assert bool(jnp.all(jnp.isfinite(out["vertices"])))

    def test_grad_flows_through_poses(self):
        m = make()

        def loss(poses):
            out = smplx.forward(m, poses, jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0))
            return jnp.sum(out["vertices"] ** 2)

        g = jax.grad(loss)(jnp.full((m.num_joints * 3,), 0.1))
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestSubsampleVertices:
    """vtex_subsample support: exact per-vertex outputs on a fixed subset."""

    def setup_method(self):
        self.m = smplx.make_test_model(num_vertices=64)
        self.sub = smplx.subsample_vertices(self.m, 16, seed=3)
        rng = np.random.default_rng(1)
        self.poses = jnp.asarray(
            0.3 * rng.normal(size=(2, self.m.num_joints * 3)), jnp.float32
        )
        self.betas = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
        self.transl = jnp.asarray(0.1 * rng.normal(size=(2, 3)), jnp.float32)

    def _idx(self):
        return np.sort(np.random.default_rng(3).choice(64, size=16, replace=False))

    def test_vertices_exactly_match_full_subset(self):
        full = smplx.forward_batch(self.m, self.poses, self.betas, self.transl)
        sub = smplx.forward_batch(self.sub, self.poses, self.betas, self.transl)
        assert sub["vertices"].shape == (2, 16, 3)
        np.testing.assert_allclose(
            np.asarray(sub["vertices"]),
            np.asarray(full["vertices"])[:, self._idx()],
            rtol=1e-6, atol=1e-6,
        )

    def test_joints_unchanged(self):
        full = smplx.forward_batch(self.m, self.poses, self.betas, self.transl)
        sub = smplx.forward_batch(self.sub, self.poses, self.betas, self.transl)
        np.testing.assert_allclose(
            np.asarray(sub["joints"]), np.asarray(full["joints"]), rtol=1e-5, atol=1e-6
        )

    def test_folded_regressor_equals_regressor_path(self):
        """j_template/j_shapedirs on the FULL model is a pure refactor."""
        folded = smplx.subsample_vertices(self.m, 64)  # n >= V -> returns model
        assert folded is self.m
        with_tables = self.m._replace(
            j_template=self.m.j_regressor @ self.m.v_template,
            j_shapedirs=jnp.einsum(
                "jv,vck->jck", self.m.j_regressor, self.m.shapedirs
            ),
        )
        a = smplx.forward_batch(self.m, self.poses, self.betas, self.transl)
        b = smplx.forward_batch(with_tables, self.poses, self.betas, self.transl)
        np.testing.assert_allclose(
            np.asarray(a["vertices"]), np.asarray(b["vertices"]), rtol=1e-5, atol=1e-6
        )

    def test_deterministic_in_seed(self):
        s2 = smplx.subsample_vertices(self.m, 16, seed=3)
        np.testing.assert_array_equal(
            np.asarray(self.sub.v_template), np.asarray(s2.v_template)
        )


class TestSocMonitorVertices:
    """The slab-form monitor forward (soc_monitor_vertices) must equal the
    per-frame forward_batch on every rig shape the train step can see."""

    def _check(self, model):
        from amuse_tpu.core import motion as motion_mod

        rng = np.random.default_rng(11)
        b, t = 2, 5
        motion = jnp.asarray(
            rng.normal(scale=0.2, size=(b, t, 168)).astype(np.float32)
        )
        m6 = motion_mod.axis_angle_to_feats6d(motion)
        betas = jnp.asarray(rng.normal(scale=0.5, size=(b, 300)).astype(np.float32))
        soc = smplx.prepare_soc(model)
        v_soc = smplx.soc_monitor_vertices(model, soc, m6, betas)  # (3, N, V)
        aa, tr = motion_mod.feats6d_to_axis_angle(m6)
        nj = model.num_joints
        n = b * t
        nb = min(betas.shape[-1], model.shapedirs.shape[-1])
        fb = jnp.broadcast_to(betas[:, None, :nb], (b, t, nb)).reshape(n, nb)
        v_ref = smplx.forward_batch(
            model, aa[:, :, :nj].reshape(n, nj * 3), fb, tr.reshape(n, 3)
        )["vertices"]
        np.testing.assert_allclose(
            np.asarray(v_soc).transpose(1, 2, 0), np.asarray(v_ref),
            rtol=1e-4, atol=1e-5,
        )

    def test_smplx_tree_rig(self):
        self._check(
            smplx.make_test_model(
                num_vertices=100, num_joints=55, num_betas=300,
                parents=smplx.SMPLX_PARENTS,
            )
        )

    def test_subsampled_rig(self):
        m = smplx.make_test_model(
            num_vertices=200, num_joints=55, num_betas=300,
            parents=smplx.SMPLX_PARENTS,
        )
        self._check(smplx.subsample_vertices(m, 64))

    def test_chain_rig_fewer_joints_than_motion(self):
        # 6-joint unit-test rig: motion carries 55 joints, the rig uses 6
        self._check(smplx.make_test_model())


class TestLevelScheduledFK:
    """The depth-level-batched FK must equal naive sequential composition on
    BRANCHED trees (the published SMPL-X tree), not just the chain rigs the
    other tests use."""

    @staticmethod
    def _fk_naive(rot_mats, joints, parents):
        j = joints.shape[0]
        world = [None] * j
        rel_j = np.asarray(joints, np.float64).copy()
        for i in range(1, j):
            if parents[i] >= 0:
                rel_j[i] = joints[i] - joints[parents[i]]
        for i in range(j):
            local = np.eye(4)
            local[:3, :3] = np.asarray(rot_mats[i], np.float64)
            local[:3, 3] = rel_j[i]
            world[i] = local if parents[i] < 0 else world[parents[i]] @ local
        world = np.stack(world)
        jh = np.concatenate([np.asarray(joints, np.float64), np.zeros((j, 1))], -1)
        corr = np.einsum("jab,jb->ja", world, jh)
        rel = world.copy()
        rel[:, :, 3] -= corr
        return world[:, :3, 3], rel

    def test_matches_naive_on_smplx_tree_and_chain(self):
        rng = np.random.default_rng(7)
        for parents in (smplx.SMPLX_PARENTS, np.arange(-1, 5, dtype=np.int32)):
            j = len(parents)
            aa = (0.4 * rng.normal(size=(j, 3))).astype(np.float32)
            joints = rng.normal(size=(j, 3)).astype(np.float32)
            rm = axis_angle_to_matrix(jnp.asarray(aa))
            pj_ref, rel_ref = self._fk_naive(np.asarray(rm), joints, np.asarray(parents))
            pj, rel = smplx._rigid_transforms(rm, jnp.asarray(joints), parents)
            np.testing.assert_allclose(np.asarray(pj), pj_ref, atol=3e-5)
            np.testing.assert_allclose(np.asarray(rel), rel_ref, atol=3e-5)

    def test_full_forward_on_smplx_tree(self):
        """End-to-end LBS on a 55-joint rig with the real branched tree."""
        m = smplx.make_test_model(
            num_vertices=32, num_joints=55, num_betas=8,
            parents=smplx.SMPLX_PARENTS,
        )
        rng = np.random.default_rng(5)
        poses = jnp.asarray(0.2 * rng.normal(size=(2, 165)), jnp.float32)
        betas = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
        transl = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
        out = smplx.forward_batch(m, poses, betas, transl)
        assert out["vertices"].shape == (2, 32, 3)
        assert bool(jnp.all(jnp.isfinite(out["vertices"])))
        # rotating only the right wrist's children must leave the left arm
        # joints fixed: cross-branch isolation through the level schedule
        m0 = m._replace(posedirs=jnp.zeros_like(m.posedirs))
        rest = smplx.forward(
            m0, jnp.zeros(165), jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0)
        )
        p = jnp.zeros(165).at[40 * 3 : 41 * 3].set(jnp.asarray([0.0, 0.8, 0.0]))
        posed = smplx.forward(m0, p, jnp.zeros(8), jnp.zeros(3), expression=jnp.zeros(0))
        left_hand = slice(25, 40)  # left-finger joints: other branch
        np.testing.assert_allclose(
            np.asarray(posed["joints"][left_hand]),
            np.asarray(rest["joints"][left_hand]),
            atol=1e-5,
        )
        moved = np.abs(
            np.asarray(posed["joints"][41:43]) - np.asarray(rest["joints"][41:43])
        ).max()
        assert moved > 1e-3  # right index-finger chain did move
